"""HiFi-GAN vocoder (fine-)training: generator + MPD/MSD adversarial steps.

The reference ships the discriminators and GAN losses but never trains its
vocoder (reference: hifigan/models.py:137-291 is dead code there).  This
module makes them operational: standard HiFi-GAN training objective
(LSGAN adversarial + feature matching + 45·mel L1), jittable on a mesh
like the acoustic trainer.

Optimizer settings follow the bundled config (hifigan/LJ_V2/config.json):
AdamW(2e-4, β=(0.8, 0.99)) with 0.999 per-epoch lr decay.
"""

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from efficientspeech_tpu.audio.mel import mel_filterbank
from efficientspeech_tpu.audio.stft import stft_magnitude
from efficientspeech_tpu.config import AudioConfig, HifiGanConfig
from efficientspeech_tpu.models.hifigan import HifiGanGenerator
from efficientspeech_tpu.models.hifigan_disc import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)

# (n_fft, hop, win) — the conventional multi-resolution STFT triple
# (Parallel WaveGAN recipe); eval/vocoder_eval.py scores the same set.
STFT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (512, 128, 512), (1024, 256, 1024), (2048, 512, 2048))


def multi_resolution_stft_loss(y_hat, y,
                               resolutions=STFT_RESOLUTIONS):
    """Spectral-convergence + log-magnitude L1 over the resolution set.

    The standard auxiliary loss against GAN re-texturing: the LSGAN +
    feature-matching + mel-L1 objective constrains the 80-band mel
    projection but leaves fine STFT structure free for the
    discriminators to bend (measured: LJ_FT fine-tuning improved
    held-out mel-L1 38% while fine-band spectral convergence DEGRADED,
    STATUS round-4 session 6).  This term pins the full-resolution
    magnitudes directly.  Returns (loss, per-part dict).
    """
    sc_sum = 0.0
    lm_sum = 0.0
    for n_fft, hop, win in resolutions:
        s_hat = stft_magnitude(y_hat, n_fft, hop, win)
        s_ref = stft_magnitude(y, n_fft, hop, win)
        num = jnp.sqrt(((s_ref - s_hat) ** 2).sum((1, 2)))
        den = jnp.sqrt((s_ref ** 2).sum((1, 2)))
        sc_sum = sc_sum + jnp.mean(num / jnp.maximum(den, 1e-8))
        lm_sum = lm_sum + jnp.mean(jnp.abs(
            jnp.log(jnp.clip(s_hat, min=1e-5))
            - jnp.log(jnp.clip(s_ref, min=1e-5))))
    n = len(resolutions)
    loss = (sc_sum + lm_sum) / n
    return loss, {"mr_sc": sc_sum / n, "mr_logmag": lm_sum / n}


@flax.struct.dataclass
class VocoderTrainState:
    step: jnp.ndarray
    gen_params: Dict
    gen_opt: Dict
    mpd_params: Dict
    msd_params: Dict
    disc_opt: Dict


def make_mel_fn(audio: AudioConfig):
    basis = jnp.asarray(mel_filterbank(
        audio.sampling_rate, audio.filter_length, audio.n_mel_channels,
        audio.mel_fmin, audio.mel_fmax))

    def mel_of(wav):
        mag = stft_magnitude(wav, audio.filter_length, audio.hop_length,
                             audio.win_length)
        m = jnp.einsum("mf,btf->btm", basis, mag)
        return jnp.log(jnp.clip(m, min=1e-5))

    return mel_of


def create_vocoder_trainer(cfg: HifiGanConfig, audio: AudioConfig,
                           lr: float = 2e-4, b1: float = 0.8,
                           b2: float = 0.99, mel_weight: float = 45.0,
                           fm_weight: float = 2.0,
                           mr_stft_weight: float = 0.0,
                           weight_decay: float = 0.01,
                           mesh=None):
    """weight_decay defaults to 0.01 = torch.optim.AdamW's default, which is
    what the upstream HiFi-GAN recipe (train.py optim.AdamW) actually uses;
    optax.adamw's own default (1e-4) silently differs.

    ``mesh``: shard (mel, wav) batches over the 'data' axis with
    replicated states — XLA inserts the gradient psums (same pattern as
    the acoustic train step, training/step.py)."""
    gen = HifiGanGenerator(cfg)
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    mel_of = make_mel_fn(audio)

    gen_tx = optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay)
    disc_tx = optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay)

    def init(rng, gen_params, segment: int = 8192):
        wav = jnp.zeros((1, segment))
        r1, r2 = jax.random.split(rng)
        mpd_params = mpd.init(r1, wav, wav)["params"]
        msd_params = msd.init(r2, wav, wav)["params"]
        return VocoderTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_opt=gen_tx.init(gen_params),
            mpd_params=mpd_params,
            msd_params=msd_params,
            disc_opt=disc_tx.init({"mpd": mpd_params, "msd": msd_params}),
        )

    def disc_loss_fn(disc_params, gen_params, mel, wav):
        y_hat = gen.apply({"params": gen_params}, mel)
        y_hat = jax.lax.stop_gradient(y_hat)
        p_r, p_g, _, _ = mpd.apply({"params": disc_params["mpd"]}, wav, y_hat)
        s_r, s_g, _, _ = msd.apply({"params": disc_params["msd"]}, wav, y_hat)
        loss_p, _, _ = discriminator_loss(p_r, p_g)
        loss_s, _, _ = discriminator_loss(s_r, s_g)
        return loss_p + loss_s

    def gen_loss_fn(gen_params, disc_params, mel, wav):
        y_hat = gen.apply({"params": gen_params}, mel)
        mel_hat = mel_of(y_hat)
        mel_ref = mel_of(wav)
        mel_l1 = jnp.mean(jnp.abs(mel_hat - mel_ref))
        p_r, p_g, p_fr, p_fg = mpd.apply({"params": disc_params["mpd"]},
                                         wav, y_hat)
        s_r, s_g, s_fr, s_fg = msd.apply({"params": disc_params["msd"]},
                                         wav, y_hat)
        adv_p, _ = generator_loss(p_g)
        adv_s, _ = generator_loss(s_g)
        fm = feature_loss(p_fr, p_fg) + feature_loss(s_fr, s_fg)
        total = adv_p + adv_s + fm_weight * fm + mel_weight * mel_l1
        aux = {"mel_l1": mel_l1, "adv": adv_p + adv_s, "fm": fm}
        if mr_stft_weight > 0.0:  # static: traced only when enabled
            mr, _ = multi_resolution_stft_loss(y_hat, wav)
            total = total + mr_stft_weight * mr
            aux["mr_stft"] = mr
        return total, aux

    def train_step(state: VocoderTrainState, mel, wav
                   ) -> Tuple[VocoderTrainState, Dict]:
        disc_params = {"mpd": state.mpd_params, "msd": state.msd_params}
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            disc_params, state.gen_params, mel, wav)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, disc_params, mel, wav)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = VocoderTrainState(
            step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt,
            mpd_params=disc_params["mpd"], msd_params=disc_params["msd"],
            disc_opt=disc_opt)
        metrics = {"disc_loss": d_loss, "gen_loss": g_loss, **aux}
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        train_step = jax.jit(train_step,
                             in_shardings=(repl, data, data),
                             out_shardings=(repl, repl))
    else:
        train_step = jax.jit(train_step)

    return gen, init, train_step
