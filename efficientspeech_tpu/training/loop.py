"""The training loop: epochs over the bucketed loader, pjit'd steps,
epoch-averaged metrics, periodic validation wav dumps, orbax checkpoints.

Replaces Lightning's Trainer.fit + EfficientSpeech hooks
(reference: train.py:66-78, model.py:212-271): same observable artifacts —
mel/pitch/energy/dur/loss/lr scalars per epoch (TensorBoard via tensorboardX
when available, always a metrics.jsonl), prediction-i.wav +
reconstruction-i.wav + prediction.txt every ``val_every_n_epochs`` epochs.
"""

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientspeech_tpu.config import (
    HifiGanConfig,
    ModelConfig,
    PreprocessConfig,
    TrainConfig,
)
from efficientspeech_tpu.data.dataset import BucketedLoader, LJSpeechDataset
from efficientspeech_tpu.models.efficientspeech import EfficientSpeech
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
from efficientspeech_tpu.parallel import make_mesh, shard_batch
from efficientspeech_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from efficientspeech_tpu.training.schedule import warmup_cosine_schedule
from efficientspeech_tpu.training.state import create_train_state, make_optimizer
from efficientspeech_tpu.training.step import make_eval_step, make_train_step
from efficientspeech_tpu.utils.tools import write_batch_wavs


class MetricLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except ImportError:
            self.tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        self.jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)


class Trainer:
    def __init__(self,
                 model_cfg: ModelConfig,
                 train_cfg: TrainConfig,
                 preprocess_cfg: PreprocessConfig,
                 hifigan_cfg: Optional[HifiGanConfig] = None,
                 hifigan_params=None,
                 dtype=jnp.bfloat16,
                 mesh=None,
                 fused_block=None):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.preprocess_cfg = preprocess_cfg
        self.hifigan_cfg = hifigan_cfg or HifiGanConfig()
        self.hifigan_params = hifigan_params
        self.dtype = dtype
        self.mesh = mesh if mesh is not None else make_mesh(
            data_parallel=train_cfg.num_data_axis)

        self.train_ds = LJSpeechDataset("train.txt", preprocess_cfg)
        self.val_ds = LJSpeechDataset("val.txt", preprocess_cfg)
        # multi-speaker corpora (speakers.json with >1 entries) get a
        # speaker-embedding model automatically unless the config already
        # reserves capacity
        if self.train_ds.n_speakers > model_cfg.n_speakers:
            import dataclasses

            model_cfg = dataclasses.replace(
                model_cfg, n_speakers=self.train_ds.n_speakers)
            self.model_cfg = model_cfg
        # fused Pallas LayerNorms + fused decoder-block kernel in the mel
        # decoder: exact semantics, measured 15.35 -> 13.03 ms/step (LN,
        # benchmarks/train_bisect.py --suite fused-ln) and further with the block kernel
        # (benchmarks/train_bisect.py --suite fused-block) at batch 128 on the v5e; CPU
        # backends use the plain path (same numerics — purely perf knobs)
        # pallas_call has no GSPMD partitioning rule, so the fused kernels
        # are single-device-mesh only (the multi-chip path uses the plain
        # XLA ops — identical numerics; wrap the step in shard_map before
        # enabling them there)
        on_accel = (jax.default_backend() != "cpu"
                    and self.mesh.devices.size == 1)
        if fused_block is None:
            fused_block = on_accel
        self.model = Phoneme2Mel(
            model_cfg, dtype=dtype,
            fused_decoder_norm=on_accel,
            fused_decoder_block=fused_block and on_accel)
        self.logger = MetricLogger(train_cfg.log_dir)
        self.train_loader = BucketedLoader(
            self.train_ds, train_cfg.batch_size, shuffle=True,
            seed=train_cfg.seed,
            max_phoneme_len=model_cfg.max_phoneme_len,
            max_mel_len=model_cfg.max_mel_len, drop_last=True,
            # the train-mode model expands into a cfg.max_mel_len buffer, so
            # every batch must arrive at exactly that static shape (also:
            # ONE compiled train step for the whole run; loss is masked)
            fixed_shape=True)
        data_size = int(self.mesh.shape.get("data", 1))
        self.val_loader = BucketedLoader(
            self.val_ds, train_cfg.batch_size, shuffle=False,
            max_phoneme_len=model_cfg.max_phoneme_len,
            max_mel_len=model_cfg.max_mel_len,
            # ONE static shape for the whole val pass: remote compiles cost
            # minutes, so eval_step must not recompile per batch shape
            fixed_shape=True,
            # the remainder batch is padded to the full batch shape in
            # evaluate() (all-PAD rows contribute zero loss), so no split
            # needs drop_last — sharded and single-chip eval see the same
            # samples
            drop_last=False)

        self.steps_per_epoch = max(1, len(self.train_loader))
        # one schedule object feeds BOTH the optimizer and the logged lr —
        # constructing them separately invites silent drift
        self.lr_schedule = warmup_cosine_schedule(
            train_cfg.lr, train_cfg.warmup_epochs, train_cfg.max_epochs,
            self.steps_per_epoch)
        self.tx = make_optimizer(train_cfg, self.steps_per_epoch,
                                 schedule=self.lr_schedule)

        params = self._init_params()
        self.state = create_train_state({"phoneme2mel": params}, train_cfg,
                                        self.steps_per_epoch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.state = jax.device_put(self.state, NamedSharding(self.mesh, P()))
        self.train_step = make_train_step(self.model, self.tx, mesh=self.mesh)
        self.eval_step = make_eval_step(self.model, mesh=self.mesh)
        self._vocoder = None
        self._val_predict = None

        # device-resident corpus: the whole train set lives in HBM; each
        # step uploads only B int32 indices (the host-fed loader ships a
        # full multi-MB batch per step — the measured bottleneck at scale)
        self.device_cache = None
        self._cached_step = None
        self.val_device_cache = None
        self._cached_eval = None
        self._cached_multi = None
        if train_cfg.device_data:
            from efficientspeech_tpu.data.device_cache import (
                DeviceDataCache,
                make_cached_eval_step,
                make_cached_multi_step,
                make_cached_train_step,
            )

            mel_dtype = jnp.bfloat16 if train_cfg.device_cache_bf16_mel \
                else np.float32
            self.device_cache = DeviceDataCache(
                self.train_ds, model_cfg.max_phoneme_len,
                model_cfg.max_mel_len, mel_dtype=mel_dtype, mesh=self.mesh)
            self._cached_step = make_cached_train_step(
                self.model, self.tx, mesh=self.mesh)
            if train_cfg.device_data_scan_steps > 1:
                self._cached_multi = make_cached_multi_step(
                    self.model, self.tx, mesh=self.mesh)
            # val set too: a val pass then uploads only indices (val mel
            # targets stay f32 — loss parity with the host-fed eval)
            self.val_device_cache = DeviceDataCache(
                self.val_ds, model_cfg.max_phoneme_len,
                model_cfg.max_mel_len, mesh=self.mesh)
            self._cached_eval = make_cached_eval_step(self.model,
                                                      mesh=self.mesh)
            print(f"device data cache: {self.device_cache.num_samples} "
                  f"train + {self.val_device_cache.num_samples} val "
                  f"samples, "
                  f"{(self.device_cache.nbytes + self.val_device_cache.nbytes) / 2**20:.0f} MB")

    def _init_params(self):
        b = self.train_cfg.batch_size
        n = self.model_cfg.max_phoneme_len
        dummy = {
            "phoneme": jnp.zeros((b, n), jnp.int32),
            "mask": jnp.ones((b, n), bool),
            "scalar": jnp.zeros((b, n), jnp.float32),
            "dur": jnp.ones((b, n), jnp.int32),
        }
        init_fn = jax.jit(lambda r: self.model.init(
            r, dummy["phoneme"], dummy["mask"], pitch_target=dummy["scalar"],
            energy_target=dummy["scalar"], duration_target=dummy["dur"],
            train=True)["params"])
        return init_fn(jax.random.PRNGKey(self.train_cfg.seed))

    def maybe_resume(self) -> int:
        path = latest_checkpoint(self.train_cfg.checkpoint_dir)
        if path:
            self.state = restore_checkpoint(path, self.state)
            print(f"resumed from {path} at step {int(self.state.step)}")
        return int(jax.device_get(self.state.step))

    def evaluate(self) -> Dict[str, float]:
        """Teacher-forced losses over the validation set, averaged with
        per-sample weights (a partial final batch contributes
        proportionally, not equally)."""
        sums: Dict[str, float] = {}
        count = 0

        def add(metrics, b):
            nonlocal count
            for k, v in jax.device_get(metrics).items():
                sums[k] = sums.get(k, 0.0) + float(v) * b
            count += b

        if self.val_device_cache is not None:
            # device-resident val set: each eval batch uploads only
            # indices; metric sums accumulate ON DEVICE (an extra
            # device_get per batch would cost a full relay round each).
            # The final partial batch is padded to the SAME static batch
            # shape with row_valid=False padding rows — their loss
            # contribution is exactly zero, so ONE compiled program
            # evaluates every sample on any mesh (no remainder drop, no
            # second compile)
            bs = self.train_cfg.batch_size
            s = self.val_device_cache.num_samples
            order = np.arange(s, dtype=np.int32)
            n_batches = -(-s // bs)
            pad = n_batches * bs - s
            if pad:
                order = np.concatenate([order,
                                        np.zeros(pad, np.int32)])
            valid = np.ones(len(order), bool)
            valid[s:] = False
            acc = None
            for i in range(n_batches):
                sl = slice(i * bs, (i + 1) * bs)
                w = int(valid[sl].sum())
                metrics = self._cached_eval(self.state.params,
                                            self.val_device_cache.arrays,
                                            order[sl], valid[sl])
                metrics = jax.tree.map(lambda m: m * w, metrics)
                acc = metrics if acc is None else jax.tree.map(
                    jnp.add, acc, metrics)
                count += w
            if acc is not None:
                for k, v in jax.device_get(acc).items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            return {k.replace("_loss", ""): v / max(count, 1)
                    for k, v in sums.items()}

        bs = self.train_cfg.batch_size
        for batch in self.val_loader:
            host = {k: v for k, v in batch.items() if k != "text"}
            real_b = len(batch["text"])
            if real_b < bs:
                # pad the remainder batch to the full static shape with
                # all-PAD rows (masks all True ⇒ zero loss contribution;
                # attention logits are finitely masked, so the rows stay
                # finite) — one program shape, works sharded
                def _pad_rows(v):
                    padding = np.zeros((bs - real_b,) + v.shape[1:],
                                       v.dtype)
                    if v.dtype == bool:
                        padding[:] = True  # masks: True = pad
                    return np.concatenate([v, padding], axis=0)

                host = {k: _pad_rows(np.asarray(v))
                        for k, v in host.items()}
            metrics = self.eval_step(self.state.params,
                                     shard_batch(host, self.mesh))
            add(metrics, real_b)
        return {k.replace("_loss", ""): v / max(count, 1)
                for k, v in sums.items()}

    # --- validation audio dumps (reference: model.py:246-271) --------------
    def _get_vocoder(self):
        if self._vocoder is None and self.hifigan_params is not None:
            from efficientspeech_tpu.models.hifigan import HifiGanGenerator

            gen = HifiGanGenerator(self.hifigan_cfg, dtype=self.dtype)

            @jax.jit
            def vocode(params, mel, mel_len):
                return gen.apply({"params": params}, mel, valid_len=mel_len)

            self._vocoder = vocode
        return self._vocoder

    def _get_val_predict(self):
        """Jitted free-running acoustic forward for validation dumps — a
        bare ``.apply`` here would dispatch op-by-op (pathological on
        tunneled TPUs) and pull params to the host every validation."""
        if self._val_predict is None:
            infer_model = Phoneme2Mel(self.model_cfg, dtype=self.dtype)
            max_mel = self.model_cfg.max_mel_len

            @jax.jit
            def predict(params, phoneme, mask):
                pred = infer_model.apply({"params": params["phoneme2mel"]},
                                         phoneme, mask, train=False)
                # the rounded/clamped per-phoneme durations the length
                # regulator consumed (acoustic.py inference branch) — the
                # quality pass scores these against aligner durations
                dur = jnp.where(mask, 0.0,
                                jnp.maximum(
                                    jnp.round(pred["duration"][..., 0]), 0.0))
                return (pred["mel"], jnp.minimum(pred["mel_len"], max_mel),
                        dur)

            self._val_predict = predict
        return self._val_predict

    def validate_audio(self, epoch: int, quality_n: int = 16
                       ) -> Optional[Dict[str, float]]:
        """Validation wav dumps (reference: model.py:246-271) PLUS the
        objective quality pass over the first ``quality_n`` val
        utterances (eval/quality.py): MCD-DTW and duration MAE always;
        F0 RMSE + voicing F1 of the predicted wav against the
        reconstruction (ground-truth mel through the same vocoder) when
        a vocoder is loaded.  Returns the aggregated metrics for
        metrics.jsonl (VERDICT r3 next #6)."""
        vocode = self._get_vocoder()
        batch = next(iter(self.val_loader))
        # device-resident params, one compiled program (the val loader's
        # fixed_shape guarantees a single static batch shape)
        mel, mel_len, dur_pred = self._get_val_predict()(
            self.state.params, jnp.asarray(batch["phoneme"]),
            jnp.asarray(batch["phoneme_mask"]))
        hop = self.preprocess_cfg.audio.hop_length
        sr = self.preprocess_cfg.audio.sampling_rate
        gt_len = (~batch["mel_mask"]).sum(axis=1).astype(np.int32)
        wavs = rec = None
        if vocode is not None:
            wavs = vocode(self.hifigan_params, mel, mel_len)
            rec = vocode(self.hifigan_params, jnp.asarray(batch["mel"]),
                         jnp.asarray(gt_len))
        # one host fetch for everything the dump + quality pass needs
        mel, mel_len, dur_pred, wavs, rec = jax.device_get(
            (mel, mel_len, dur_pred, wavs, rec))
        lengths = np.asarray(mel_len) * hop
        if wavs is not None:
            write_batch_wavs(np.asarray(wavs, np.float32), lengths,
                             self.train_cfg.wav_path, "prediction",
                             sr, self.preprocess_cfg.audio.max_wav_value)
            write_batch_wavs(np.asarray(rec, np.float32), gt_len * hop,
                             self.train_cfg.wav_path, "reconstruction",
                             sr, self.preprocess_cfg.audio.max_wav_value)
            os.makedirs(self.train_cfg.wav_path, exist_ok=True)
            with open(os.path.join(self.train_cfg.wav_path,
                                   "prediction.txt"), "w") as f:
                for t in batch["text"]:
                    f.write(t + "\n")

        from efficientspeech_tpu.eval.quality import (
            batch_quality,
            duration_mae,
            utterance_quality,
        )

        per_utt = []
        for i in range(min(quality_n, len(batch["text"]))):
            p_len, g_len = int(mel_len[i]), int(gt_len[i])
            real = ~np.asarray(batch["phoneme_mask"][i])
            if p_len < 1 or g_len < 1:
                # an untrained duration predictor can emit an all-zero
                # expansion — duration MAE is still defined (and is the
                # signal that says WHY the mel is empty)
                per_utt.append({"duration_mae_frames": duration_mae(
                    dur_pred[i], batch["duration"][i], real)})
                continue
            per_utt.append(utterance_quality(
                np.asarray(mel[i][:p_len], np.float32),
                np.asarray(batch["mel"][i][:g_len], np.float32),
                dur_pred=dur_pred[i], dur_gt=batch["duration"][i],
                phoneme_real=real,
                wav_pred=None if wavs is None else wavs[i][:p_len * hop],
                wav_ref=None if rec is None else rec[i][:g_len * hop],
                sr=sr, hop=hop))
        return batch_quality(per_utt) if per_utt else None

    # --- main loop ----------------------------------------------------------
    def fit(self, max_epochs: Optional[int] = None,
            checkpoint_every_epochs: int = 10,
            max_steps: Optional[int] = None,
            handle_signals: bool = True):
        """handle_signals: SIGTERM/SIGINT request a graceful stop — finish
        the current epoch's dispatched steps, checkpoint, and return (TPU
        pods are preemptible; the reference's Lightning run dies mid-epoch
        and restarts from the last periodic checkpoint).  Resume picks up
        from the saved step as usual."""
        max_epochs = max_epochs or self.train_cfg.max_epochs
        start_step = self.maybe_resume()
        start_epoch = start_step // self.steps_per_epoch
        t0 = time.time()
        step = start_step

        stop_requested = {"flag": False}
        old_handlers = {}
        if handle_signals:
            import signal
            import threading

            def _request_stop(signum, _frame):
                stop_requested["flag"] = True
                print(f"signal {signum}: finishing epoch, checkpointing...")

            if threading.current_thread() is threading.main_thread():
                for sig in (signal.SIGTERM, signal.SIGINT):
                    old_handlers[sig] = signal.signal(sig, _request_stop)

        for epoch in range(start_epoch, max_epochs):
            # accumulate metric sums ON DEVICE; one fetch per epoch — a
            # per-step device_get costs a full relay round trip on tunneled
            # TPUs and stalls the async dispatch queue
            acc = None
            count = 0
            if self.device_cache is not None:
                # device-resident path: per-step upload is B indices only
                idx_mat = self.device_cache.epoch_batches(
                    self.train_cfg.batch_size, epoch,
                    seed=self.train_cfg.seed)
                K = max(1, self.train_cfg.device_data_scan_steps)
                remaining = (None if max_steps is None
                             else max(0, max_steps - step))

                def cached_steps(idx_mat=idx_mat, K=K, remaining=remaining):
                    # full K-row chunks go through the scanned multi-step
                    # program (ONE dispatch = K optimizer steps); the tail
                    # — and the approach to max_steps — run single steps so
                    # no second scan shape ever compiles
                    i, n = 0, len(idx_mat)
                    while i < n:
                        k = min(K, n - i)
                        if remaining is not None:
                            k = min(k, remaining)
                            if k == 0:
                                return
                        if k == K and K > 1 and self._cached_multi is not None:
                            yield (self._cached_multi,
                                   (self.device_cache.arrays,
                                    idx_mat[i:i + K]), K)
                        else:
                            for row in idx_mat[i:i + k]:
                                yield (self._cached_step,
                                       (self.device_cache.arrays, row), 1)
                        i += k
                        if remaining is not None:
                            remaining -= k

                steps_iter = cached_steps()
            else:
                self.train_loader.epoch = epoch  # deterministic resume order
                steps_iter = (
                    (self.train_step,
                     (shard_batch({k: v for k, v in batch.items()
                                   if k != "text"}, self.mesh),), 1)
                    for batch in self.train_loader)
            for step_fn, step_args, k_steps in steps_iter:
                self.state, metrics = step_fn(self.state, *step_args)
                if k_steps > 1:  # scanned chunk: metrics stacked (K,)
                    metrics = jax.tree.map(lambda m: m.sum(0), metrics)
                step += k_steps
                count += k_steps
                acc = metrics if acc is None else jax.tree.map(
                    jnp.add, acc, metrics)
                if max_steps is not None and step >= max_steps:
                    break
                if stop_requested["flag"]:
                    break

            sums = {k: float(v)
                    for k, v in jax.device_get(acc or {}).items()}
            scalars = {k.replace("_loss", ""): v / max(count, 1)
                       for k, v in sums.items()}
            scalars["lr"] = float(self.lr_schedule(step))
            scalars["epoch"] = epoch
            scalars["wall_secs"] = time.time() - t0
            self.logger.log(step, scalars)

            if (epoch + 1) % checkpoint_every_epochs == 0 or \
                    (max_steps is not None and step >= max_steps):
                save_checkpoint(self.train_cfg.checkpoint_dir, self.state,
                                step=step)
            if epoch >= 1 and (epoch + 1) % self.train_cfg.val_every_n_epochs == 0:
                val = self.evaluate()
                self.logger.log(step, {f"val_{k}": v for k, v in val.items()})
                try:
                    quality = self.validate_audio(epoch)
                    if quality:
                        self.logger.log(step, {f"val_{k}": v
                                               for k, v in quality.items()})
                except Exception as e:  # audio dumps must not kill training
                    print(f"validation audio dump failed: {e}")
            if max_steps is not None and step >= max_steps:
                break
            if stop_requested["flag"]:
                break

        save_checkpoint(self.train_cfg.checkpoint_dir, self.state, step=step)
        if old_handlers:
            import signal

            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        return step
