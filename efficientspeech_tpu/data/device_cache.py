"""Device-resident training corpus: the whole preprocessed dataset lives in
HBM; each training step uploads only its batch INDICES.

Why: the reference streams batches host→device every step (its Lightning
DataLoader, reference: datamodule.py:78-131) — fine over PCIe, pathological
over a tunneled link and still the limiting factor on real hosts once the
device step is fast (the round-2 scale run measured a 2.8 ms device step
fed at 0.56 steps/s because every step shipped a 42 MB batch).  The
TPU-native fix is to make the *dataset* device-resident: all features are
padded to the training step's static (max_phoneme, max_mel) shape ONCE,
uploaded ONCE, and each step gathers its batch rows on device from int32
indices (the only per-step host→device traffic — a few hundred bytes).

Memory: LJSpeech-scale (13,100 utterances, mel (S, 1152, 80)) is ~4.8 GB in
f32 or ~2.4 GB in bf16 — comfortable in one v5e's 16 GB HBM next to a
266k-4M-param model.  ``mel_dtype=jnp.bfloat16`` halves the footprint and
upload time; the gather casts back to f32 before the loss.

Multi-chip: the cache is REPLICATED over the mesh and the index vector is
sharded over the 'data' axis, so each replica's gather touches only its own
HBM copy (a replicated-operand / sharded-index gather needs no collectives)
and the batch comes out sharded over 'data' exactly like the host-fed path.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_host_cache(dataset, max_phoneme_len: int, max_mel_len: int,
                     mel_dtype=np.float32) -> Dict[str, np.ndarray]:
    """Pad every utterance to the static training shape (same alignment
    rules as BucketedLoader._assemble: durations clamped so their cumsum
    never exceeds the mel buffer, mel valid-region = the aligned frames)."""
    s = len(dataset)
    n_pad, m_pad = max_phoneme_len, max_mel_len
    first = dataset[0]
    n_mels = first["mel"].shape[1]

    cache = {
        "phoneme": np.zeros((s, n_pad), np.int32),
        "speaker": np.asarray(getattr(dataset, "speaker_id",
                                      np.zeros(s, np.int32))[:s], np.int32),
        "pitch": np.zeros((s, n_pad), np.float32),
        "energy": np.zeros((s, n_pad), np.float32),
        "duration": np.zeros((s, n_pad), np.int32),
        "mel": np.zeros((s, m_pad, n_mels), mel_dtype),
        "phoneme_len": np.zeros((s,), np.int32),
        "mel_len": np.zeros((s,), np.int32),
    }
    for i in range(s):
        item = dataset[i]
        n = min(len(item["phoneme"]), n_pad)
        cache["phoneme"][i, :n] = item["phoneme"][:n]
        cache["pitch"][i, :n] = item["pitch"][:n]
        cache["energy"][i, :n] = item["energy"][:n]
        d = item["duration"][:n].astype(np.int64)
        prev = np.cumsum(d) - d
        d = np.clip(np.minimum(d, m_pad - prev), 0, None)
        cache["duration"][i, :n] = d
        m = min(item["mel"].shape[0], m_pad, int(d.sum()))
        cache["mel"][i, :m] = item["mel"][:m].astype(mel_dtype)
        cache["phoneme_len"][i] = n
        cache["mel_len"][i] = m
    return cache


def upload_cache(host_cache: Dict[str, np.ndarray], mesh=None,
                 chunk_bytes: int = 256 * 1024 * 1024):
    """Host cache → device arrays (replicated over the mesh if given).

    Large arrays upload in row chunks and are joined by one compiled
    concatenate — a single multi-GB transfer is fragile on relayed links
    (and the chunks bound peak host memory duplication).
    """
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P())

    def put(x):
        if sharding is None:
            return jax.device_put(x)
        return jax.device_put(x, sharding)

    out = {}
    for k, v in host_cache.items():
        if v.nbytes <= chunk_bytes or v.shape[0] < 2:
            out[k] = put(v)
            continue
        rows_per = max(1, chunk_bytes // max(1, v.nbytes // v.shape[0]))
        parts = [put(v[i:i + rows_per])
                 for i in range(0, v.shape[0], rows_per)]
        concat = jax.jit(
            lambda *ps: jnp.concatenate(ps, axis=0),
            **({} if sharding is None else {"out_shardings": sharding}))
        out[k] = concat(*parts)
    return out


def gather_batch(cache: Dict, idx) -> Dict:
    """Device-side batch assembly: gather rows, derive masks from lengths.

    Output schema matches BucketedLoader batches (minus 'text'), so the
    loss/step code is shared verbatim with the host-fed path.
    """
    phoneme = cache["phoneme"][idx]
    n_pad = phoneme.shape[-1]
    m_pad = cache["mel"].shape[1]
    plen = cache["phoneme_len"][idx]
    mlen = cache["mel_len"][idx]
    pos_n = jnp.arange(n_pad, dtype=jnp.int32)
    pos_m = jnp.arange(m_pad, dtype=jnp.int32)
    return {
        "phoneme": phoneme,
        "phoneme_mask": pos_n[None, :] >= plen[:, None],
        "speaker": cache["speaker"][idx],
        "pitch": cache["pitch"][idx],
        "energy": cache["energy"][idx],
        "duration": cache["duration"][idx],
        "mel": cache["mel"][idx].astype(jnp.float32),
        "mel_mask": pos_m[None, :] >= mlen[:, None],
    }


class DeviceDataCache:
    """Bundles cache build + upload + per-epoch index batching."""

    def __init__(self, dataset, max_phoneme_len: int, max_mel_len: int,
                 mel_dtype=np.float32, mesh=None,
                 chunk_bytes: int = 256 * 1024 * 1024):
        host = build_host_cache(dataset, max_phoneme_len, max_mel_len,
                                mel_dtype=mel_dtype)
        self.num_samples = len(dataset)
        self.nbytes = sum(v.nbytes for v in host.values())
        self.arrays = upload_cache(host, mesh=mesh, chunk_bytes=chunk_bytes)
        del host

    def epoch_batches(self, batch_size: int, epoch: int, seed: int = 0,
                      drop_last: bool = True) -> np.ndarray:
        """(steps, batch) int32 index matrix for one shuffled epoch pass."""
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(self.num_samples).astype(np.int32)
        n_full = len(order) // batch_size
        if n_full == 0:
            drop_last = False  # corpus smaller than one batch: resample
        if not drop_last and len(order) % batch_size:
            # pad the tail batch by resampling (training-only semantics);
            # tile when the corpus is smaller than even one batch
            pad = batch_size - len(order) % batch_size
            reps = -(-pad // len(order))
            order = np.concatenate([order] + [order] * reps)[
                : (n_full + 1) * batch_size]
            n_full = len(order) // batch_size
        return order[: n_full * batch_size].reshape(n_full, batch_size)


def make_cached_eval_step(model, mesh=None):
    """eval_step(params, cache, idx, row_valid) -> loss dict; teacher-forced
    forward over device-resident rows (the val-set counterpart of the cached
    train step — a val pass uploads only indices).

    ``row_valid`` (B,) bool marks which rows are real samples: the final
    partial val batch is padded to the full static batch shape with
    arbitrary indices and ``row_valid=False`` — those rows become fully
    masked, so the masked-mean losses are EXACTLY those of the unpadded
    remainder.  One compiled program thus evaluates every batch including
    the remainder, on any mesh (the round-2 code dropped the remainder on
    sharded meshes and compiled a second smaller program on single-chip)."""
    from efficientspeech_tpu.training.losses import compute_losses

    def step(params, cache, idx, row_valid):
        batch = gather_batch(cache, idx)
        pred = model.apply(
            {"params": params["phoneme2mel"]
             if "phoneme2mel" in params else params},
            batch["phoneme"], batch["phoneme_mask"],
            pitch_target=batch["pitch"],
            energy_target=batch["energy"],
            duration_target=batch["duration"],
            speaker=batch.get("speaker"),
            train=True)
        # the model sees the rows' true masks (padding rows duplicate a
        # real sample — finite activations everywhere); only the LOSS
        # masks every position of a padding row, which zeroes both its
        # numerator and denominator contribution
        invalid = ~row_valid
        loss_batch = dict(
            batch,
            phoneme_mask=batch["phoneme_mask"] | invalid[:, None],
            mel_mask=batch["mel_mask"] | invalid[:, None])
        return compute_losses(pred, loss_batch)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, repl, data, data),
                       out_shardings=repl)
    return jax.jit(step)


def _make_step_body(model, tx):
    """Shared gather + forward + backward + AdamW body for the cached
    train steps: (state, cache, idx) -> (new_state, metrics)."""
    import optax

    from efficientspeech_tpu.training.losses import compute_losses

    def loss_fn(trainable, batch):
        pred = model.apply(
            {"params": trainable["phoneme2mel"]
             if "phoneme2mel" in trainable else trainable},
            batch["phoneme"], batch["phoneme_mask"],
            pitch_target=batch["pitch"],
            energy_target=batch["energy"],
            duration_target=batch["duration"],
            speaker=batch.get("speaker"),
            train=True)
        losses = compute_losses(pred, batch)
        return losses["loss"], losses

    def step(state, cache, idx):
        batch = gather_batch(cache, idx)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state)
        return new_state, metrics

    return step


def make_cached_train_step(model, tx, mesh=None, donate: bool = True,
                           state_sharding=None):
    """train_step(state, cache, idx) -> (state, metrics), one jitted program:
    gather + forward + masked losses + backward + AdamW update.

    The cache dict is a jit ARGUMENT (the same device buffers every call —
    zero per-step transfer) rather than a closure capture, which would bake
    multi-GB constants into the HLO (remote-compile HTTP 413; see
    CLAUDE.md).  Only ``state`` is donated.
    """
    step = _make_step_body(model, tx)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = state_sharding if state_sharding is not None else repl
        return jax.jit(step,
                       in_shardings=(st, repl, data),
                       out_shardings=(st, repl),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cached_multi_step(model, tx, mesh=None, donate: bool = True,
                           state_sharding=None):
    """multi_step(state, cache, idxs) with idxs (K, B): ONE dispatch runs K
    optimizer steps via lax.scan and returns per-step metrics stacked (K,).

    Why: with the device-resident corpus the per-step cost is dispatch
    overhead, not compute (measured 14.5 ms/step vs ~3 ms device compute on
    the tunneled chip).  Scanning K steps inside one program amortizes the
    dispatch to ~1/K — the TPU-native analogue of a multi-batch host loop,
    exactly equivalent numerically to K sequential single steps (tested).
    """
    step = _make_step_body(model, tx)

    def multi(state, cache, idxs):
        def body(st, idx):
            return step(st, cache, idx)

        return jax.lax.scan(body, state, idxs)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, "data"))
        st = state_sharding if state_sharding is not None else repl
        return jax.jit(multi,
                       in_shardings=(st, repl, data),
                       out_shardings=(st, repl),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(multi, donate_argnums=(0,) if donate else ())
