#!/usr/bin/env python3
"""HiFi-GAN vocoder training CLI (adversarial fine-tuning on TPU).

The reference ships the discriminators + GAN losses as dead code
(reference: hifigan/models.py:137-291 — there is no vocoder trainer to
run); this CLI makes vocoder (fine-)training a first-class workflow:
random wav segments from the corpus, on-device mel targets, the full
LSGAN + feature-matching + 45·mel-L1 objective (training/vocoder.py),
mesh data-parallelism, orbax checkpoints with resume, and metrics.jsonl.

    python train_vocoder.py --preprocess-config config.yaml \
        --steps 1000 --batch-size 8 [--resume] [--init-generator PATH]

``--from-acoustic CKPT`` switches to the LJ_FT_T2_V2 recipe: the vocoder
trains on the acoustic model's TEACHER-FORCED predicted mels (aligned to
the real audio by the ground-truth durations) instead of ground-truth
mels — the fine-tuned-vocoder variant the reference bundles weights for
(hifigan/LJ_FT_T2_V2/config.json) but cannot itself produce:

    python train_vocoder.py --preprocess-config config.yaml \
        --from-acoustic checkpoints/ --init-generator \
        /path/to/generator_v2 --steps 1000
"""

import argparse
import glob
import json
import os
import time

import numpy as np


def build_acoustic_pairs(ckpt: str, preset: str, pre_yaml: str,
                         limit: int, seed: int, arch_overrides=None,
                         forward_batch: int = 16):
    """(teacher-forced predicted mel, aligned ground-truth audio) pairs.

    The reference bundles ``LJ_FT_T2_V2`` — a HiFi-GAN fine-tuned on its
    acoustic model's output mels (reference: hifigan/LJ_FT_T2_V2/config.json,
    loaded by model.py:23-48) — but ships no code that can produce such a
    checkpoint.  This builds that recipe's training pairs: run the trained
    acoustic model TEACHER-FORCED (ground-truth pitch/energy/duration, so
    predicted frames stay aligned with the real audio), and pair each
    predicted mel with the silence-trimmed wav span the preprocessor used
    (re-derived from the MFA TextGrid).  Fine-tuning on these pairs teaches
    the vocoder the acoustic model's actual output distribution instead of
    ground-truth mels.

    Returns (pairs, hop, n_mels); pairs is a list of
    (mel float16 (T, n_mels), wav int16 (T*hop,)).
    """
    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.config import ModelConfig, PreprocessConfig
    from efficientspeech_tpu.data.dataset import LJSpeechDataset
    from efficientspeech_tpu.data.preprocessor import Preprocessor, load_wav
    from efficientspeech_tpu.data.textgrid import read_textgrid
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
    from efficientspeech_tpu.training.checkpoint import (
        latest_checkpoint, restore_params)

    pre_cfg = PreprocessConfig.from_yaml(pre_yaml)
    stats = pre_cfg.load_stats()
    ds = LJSpeechDataset("train.txt", pre_cfg, cache_in_memory=False)
    pre = Preprocessor(pre_cfg)
    hop = pre_cfg.audio.hop_length
    n_mels = pre_cfg.audio.n_mel_channels
    sr = pre_cfg.audio.sampling_rate

    payload = restore_params(latest_checkpoint(ckpt) or ckpt)
    if isinstance(payload, dict) and "params" in payload:
        payload = payload["params"]  # train.py step_* checkpoint
    params = payload.get("phoneme2mel", payload)

    rng = np.random.default_rng(seed)
    sel = rng.permutation(len(ds))
    if limit:
        sel = sel[:limit]
    # ONE static forward shape for the whole sweep (a fresh shape is a
    # multi-minute remote compile on the tunneled chip)
    n_pad = max(16, int(-(-max(len(ds.phonemes[i]) for i in sel) // 16) * 16))
    m_need = max(int(np.sum(ds[int(i)]["duration"])) for i in sel)
    m_pad = max(64, int(-(-m_need // 64) * 64))
    cfg = ModelConfig.preset(
        preset, pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=n_pad, max_mel_len=m_pad,
        n_speakers=ds.n_speakers, **(arch_overrides or {}))
    model = Phoneme2Mel(cfg, dtype=jnp.float32)

    @jax.jit
    def forward(phoneme, mask, pitch, energy, duration, speaker):
        pred = model.apply({"params": params}, phoneme, mask,
                           pitch_target=pitch, energy_target=energy,
                           duration_target=duration, speaker=speaker,
                           train=True)
        return pred["mel"]

    pairs = []
    for lo in range(0, len(sel), forward_batch):
        idxs = sel[lo: lo + forward_batch]
        b = forward_batch  # fixed batch dim: pad the tail with zero rows
        phoneme = np.zeros((b, n_pad), np.int32)
        mask = np.ones((b, n_pad), bool)
        pitch = np.zeros((b, n_pad), np.float32)
        energy = np.zeros((b, n_pad), np.float32)
        duration = np.zeros((b, n_pad), np.int32)
        speaker = np.zeros((b,), np.int32)
        wavs = []
        for r, i in enumerate(idxs):
            s = ds[int(i)]
            n = min(len(s["phoneme"]), n_pad)
            phoneme[r, :n] = s["phoneme"][:n]
            mask[r, :n] = False
            pitch[r, :n] = s["pitch"][:n]
            energy[r, :n] = s["energy"][:n]
            # clamp durations into the static mel buffer (same alignment
            # rule as data/dataset.py:209-216)
            d = s["duration"][:n].astype(np.int64)
            prev = np.cumsum(d) - d
            duration[r, :n] = np.clip(np.minimum(d, m_pad - prev), 0, None)
            speaker[r] = s.get("speaker", 0)
            # the preprocessor's silence-trimmed wav span, from the TextGrid
            spk, base = ds.speaker[int(i)], ds.basename[int(i)]
            tiers = read_textgrid(os.path.join(
                pre.out_dir, "TextGrid", spk, f"{base}.TextGrid"))
            _, _, t0, t1 = pre.get_alignment(tiers["phones"])
            wav = load_wav(os.path.join(pre.in_dir, spk, f"{base}.wav"), sr)
            wavs.append(wav[int(sr * t0): int(sr * t1)])
        mel = np.asarray(forward(jnp.asarray(phoneme), jnp.asarray(mask),
                                 jnp.asarray(pitch), jnp.asarray(energy),
                                 jnp.asarray(duration), jnp.asarray(speaker)))
        for r in range(len(idxs)):
            t = min(int(duration[r].sum()), len(wavs[r]) // hop)
            if t <= 0:
                continue
            pairs.append((mel[r, :t].astype(np.float16),
                          np.clip(wavs[r][: t * hop] * 32767.0,
                                  -32768, 32767).astype(np.int16)))
    if not pairs:
        raise SystemExit("--from-acoustic: no usable utterances "
                         "(empty train.txt or all alignments degenerate)")
    return pairs, hop, n_mels


def find_wavs(config: dict):
    raw = config["path"]["raw_path"]
    wavs = sorted(glob.glob(os.path.join(raw, "**", "*.wav"),
                            recursive=True))
    if not wavs:  # fall back to the un-prepared corpus layout
        wavs = sorted(glob.glob(os.path.join(
            config["path"]["corpus_path"], "**", "*.wav"), recursive=True))
    return wavs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preprocess-config", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--segment", type=int, default=8192,
                        help="training crop in samples (HiFi-GAN default)")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--mr-stft-weight", type=float, default=0.0,
                        help="weight of the multi-resolution STFT "
                             "auxiliary loss (sc + log-magnitude over "
                             "512/1024/2048 FFTs).  0 = the pure HiFi-GAN "
                             "objective; ~2.5 pins the fine-band spectra "
                             "the GAN otherwise re-textures (measured: "
                             "LJ_FT fine-tuning degraded held-out "
                             "fine-band SC while improving mel-L1)")
    parser.add_argument("--data-parallel", type=int, default=1,
                        help="data-mesh size (must divide batch-size)")
    parser.add_argument("--init-generator", default=None,
                        help="warm-start generator weights: a HiFi-GAN "
                             "torch checkpoint (e.g. the bundled LJ_V2 "
                             "generator) or an orbax params dir")
    parser.add_argument("--from-acoustic", default=None, metavar="CKPT",
                        help="orbax checkpoint of a trained acoustic model "
                             "(train.py checkpoint dir or step_* dir): "
                             "fine-tune on its TEACHER-FORCED predicted "
                             "mels paired with the aligned real audio — "
                             "the LJ_FT_T2_V2 recipe the reference bundles "
                             "but has no code to produce")
    parser.add_argument("--acoustic-preset", default="tiny",
                        help="acoustic architecture preset of "
                             "--from-acoustic (tiny/small/base)")
    parser.add_argument("--max-utterances", type=int, default=2000,
                        help="utterance cap for the --from-acoustic "
                             "pair-building sweep (bounds host RAM)")
    parser.add_argument("--holdout-frac", type=float, default=0.0,
                        help="--from-acoustic only: hold this fraction of "
                             "the teacher-forced pairs OUT of training and "
                             "score the generator on them (mel-L1 + multi-"
                             "resolution STFT distance, eval/vocoder_eval"
                             ".py) BEFORE and AFTER fine-tuning — the "
                             "before/after evidence the reference's "
                             "bundled LJ_FT_T2_V2 weights lack")
    parser.add_argument("--eval-batch", type=int, default=8,
                        help="static batch of the holdout eval sweep")
    parser.add_argument("--checkpoint-dir", default="vocoder_ckpt")
    parser.add_argument("--log-dir", default="vocoder_logs")
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--initial-channels", type=int, default=None,
                        help="override upsample_initial_channel (smaller "
                             "generators for smoke tests)")
    args = parser.parse_args(argv)
    if args.batch_size % args.data_parallel:
        parser.error(f"--batch-size ({args.batch_size}) must be divisible "
                     f"by --data-parallel ({args.data_parallel})")

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import yaml

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import AudioConfig, HifiGanConfig
    from efficientspeech_tpu.data.preprocessor import load_wav
    from efficientspeech_tpu.parallel import make_mesh
    from efficientspeech_tpu.training.vocoder import (
        create_vocoder_trainer, make_mel_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    config = yaml.safe_load(open(args.preprocess_config))
    audio = AudioConfig(
        sampling_rate=config["preprocessing"]["audio"]["sampling_rate"])
    cfg = HifiGanConfig() if args.initial_channels is None else \
        HifiGanConfig(upsample_initial_channel=args.initial_channels)
    mesh = make_mesh(data_parallel=args.data_parallel)

    wav_paths = find_wavs(config)
    if not wav_paths and not args.from_acoustic:
        raise SystemExit(f"no .wav files under "
                         f"{config['path']['raw_path']}")
    print(f"{len(wav_paths)} wav files; batch {args.batch_size} x "
          f"{args.segment} samples; mesh {dict(mesh.shape)}")

    gen, init, train_step = create_vocoder_trainer(
        cfg, audio, lr=args.lr, mr_stft_weight=args.mr_stft_weight,
        mesh=mesh)
    mel_of = jax.jit(make_mel_fn(audio))

    rng = jax.random.PRNGKey(args.seed)
    if args.init_generator:
        from efficientspeech_tpu.convert import load_hifigan_checkpoint

        gen_params = load_hifigan_checkpoint(args.init_generator)
        print(f"generator warm-started from {args.init_generator}")
    else:
        dummy = jnp.zeros((1, args.segment // audio.hop_length, 80))
        gen_params = gen.init(rng, dummy)["params"]
    state = init(rng, gen_params, segment=args.segment)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    ckptr = ocp.StandardCheckpointer()
    start_step = 0
    if args.resume:
        steps = sorted(glob.glob(os.path.join(
            os.path.abspath(args.checkpoint_dir), "step_*")))
        if steps:
            template = jax.device_get(state)
            state = ckptr.restore(steps[-1], template)
            state = jax.device_put(state, NamedSharding(mesh, P()))
            start_step = int(jax.device_get(state.step))
            print(f"resumed from {steps[-1]} (step {start_step})")

    def save(state):
        step = int(jax.device_get(state.step))
        path = os.path.join(os.path.abspath(args.checkpoint_dir),
                            f"step_{step:08d}")
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
        return path

    os.makedirs(args.log_dir, exist_ok=True)
    log_f = open(os.path.join(args.log_dir, "metrics.jsonl"), "a")

    # host-side sampler: random file, random crop (standard HiFi-GAN
    # recipe); mel targets are computed ON DEVICE from the same crop
    nrng = np.random.default_rng(args.seed + start_step)
    cache = {}
    hop = audio.hop_length
    seg_frames = args.segment // hop

    acoustic_pairs = None
    holdout_pairs = None
    if args.from_acoustic:
        acoustic_pairs, hop, n_mels = build_acoustic_pairs(
            args.from_acoustic, args.acoustic_preset,
            args.preprocess_config, args.max_utterances, args.seed)
        seg_frames = args.segment // hop
        if args.holdout_frac > 0 and len(acoustic_pairs) >= 2:
            # build_acoustic_pairs already visits utterances in a seeded
            # random permutation, so a tail slice is a random split
            k = max(1, int(round(len(acoustic_pairs) * args.holdout_frac)))
            k = min(k, len(acoustic_pairs) - 1)
            holdout_pairs = acoustic_pairs[-k:]
            acoustic_pairs = acoustic_pairs[:-k]
        print(f"fine-tuning on {len(acoustic_pairs)} teacher-forced "
              f"acoustic-mel/audio pairs from {args.from_acoustic}"
              + (f" ({len(holdout_pairs)} held out)" if holdout_pairs
                 else ""))

    def eval_holdout(phase, state):
        from efficientspeech_tpu.eval.vocoder_eval import (
            evaluate_pairs, make_holdout_eval)

        if not hasattr(eval_holdout, "_fn"):
            eval_holdout._fn = make_holdout_eval(gen, audio)
        m = evaluate_pairs(gen, state.gen_params, holdout_pairs, audio,
                           batch=args.eval_batch, eval_fn=eval_holdout._fn)
        m = {k: round(float(v), 5) for k, v in m.items()}
        m.update(eval="holdout", phase=phase,
                 step=int(jax.device_get(state.step)))
        print(m, flush=True)
        log_f.write(json.dumps(m) + "\n")
        log_f.flush()
        return m

    def sample_batch():
        b = args.batch_size
        out = np.zeros((b, args.segment), np.float32)
        if acoustic_pairs is not None:
            mel = np.zeros((b, seg_frames, n_mels), np.float32)
            for i in range(b):
                mel_u, wav_u = acoustic_pairs[
                    int(nrng.integers(len(acoustic_pairs)))]
                t = mel_u.shape[0]
                if t <= seg_frames:
                    mel[i, :t] = mel_u
                    out[i, : t * hop] = wav_u / 32767.0
                else:
                    f0 = int(nrng.integers(t - seg_frames))
                    mel[i] = mel_u[f0: f0 + seg_frames]
                    out[i] = wav_u[f0 * hop: (f0 + seg_frames) * hop] \
                        / 32767.0
            return mel, out
        for i in range(b):
            path = wav_paths[int(nrng.integers(len(wav_paths)))]
            wav = cache.get(path)
            if wav is None:
                wav = load_wav(path, audio.sampling_rate)
                if len(cache) < 2000:
                    cache[path] = wav
            if len(wav) <= args.segment:
                out[i, : len(wav)] = wav
            else:
                s = int(nrng.integers(len(wav) - args.segment))
                out[i] = wav[s: s + args.segment]
        return out

    before = eval_holdout("before", state) if holdout_pairs else None

    t0 = time.time()
    metrics = None
    for step in range(start_step + 1, args.steps + 1):
        if acoustic_pairs is not None:
            mel_np, wav_np = sample_batch()
            mel, wav = jnp.asarray(mel_np), jnp.asarray(wav_np)
        else:
            wav = jnp.asarray(sample_batch())
            mel = mel_of(wav)[:, : args.segment // audio.hop_length, :]
        state, metrics = train_step(state, mel, wav)
        if step % args.log_every == 0 or step == args.steps:
            m = {k: round(float(v), 4)
                 for k, v in jax.device_get(metrics).items()}
            m.update(step=step, wall_secs=round(time.time() - t0, 1))
            print(m, flush=True)
            log_f.write(json.dumps(m) + "\n")
            log_f.flush()
        if step % args.checkpoint_every == 0:
            save(state)
    path = save(state)
    if holdout_pairs:
        after = eval_holdout("after", state)
        print("holdout delta (after - before): "
              + ", ".join(f"{k} {after[k] - before[k]:+.5f}"
                          for k in ("mel_l1", "mr_stft")))
    print(f"done at step {int(jax.device_get(state.step))}; "
          f"checkpoint {path}")


if __name__ == "__main__":
    main()
