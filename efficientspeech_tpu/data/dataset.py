"""Dataset + bucketed batching (reference: datamodule.py:20-186).

TPU-native design differences from the reference's DataLoader/collate:

- phoneme IDs are tokenized once at init (the reference re-tokenizes in
  every ``__getitem__``, datamodule.py:134),
- batches are padded to STATIC bucket shapes (phoneme bucket × mel bucket)
  so each shape compiles exactly one XLA program; the reference's
  sort-by-length collate (datamodule.py:31-32) becomes global
  length-bucketed batch assembly, which also reduces padding waste,
- a background thread prefetches host batches so device steps overlap IO.

Batch schema matches the reference collate (datamodule.py:29-76):
phoneme/phoneme_mask/pitch/energy/duration at phoneme rate, mel/mel_mask at
frame rate, plus text for validation dumps.
"""

import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from efficientspeech_tpu.config import PreprocessConfig
from efficientspeech_tpu.text import text_to_sequence


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class LJSpeechDataset:
    """Loads the preprocessed dataset emitted by the preprocessing pipeline:
    ``{mel,pitch,energy,duration}/*.npy`` + ``train.txt``/``val.txt``
    (reference on-disk layout: preprocessor/preprocessor.py:54-57,142-151)."""

    def __init__(self, filename: str, cfg: PreprocessConfig,
                 cache_in_memory: bool = True):
        self.cfg = cfg
        self.preprocessed_path = cfg.preprocessed_path
        self.cleaners = list(cfg.text_cleaners)
        self.max_text_length = cfg.max_length
        (self.basename, self.speaker, self.text,
         self.raw_text) = self._process_meta(filename)
        # speaker name → integer id, from the preprocessor's speakers.json
        # (single-speaker corpora map everything to 0)
        self.speaker_map = self._load_speaker_map()
        self.speaker_id = np.asarray(
            [self.speaker_map.get(s, 0) for s in self.speaker], np.int32)
        # tokenize once (deterministic; avoids per-access regex work)
        self.phonemes: List[np.ndarray] = [
            np.asarray(text_to_sequence(t, self.cleaners), dtype=np.int32)
            for t in self.text
        ]
        # at TPU step rates (hundreds of steps/s) per-item np.load cannot
        # keep up; LJSpeech features are ~2.5 GB and fit in RAM
        self._cache: List[Dict] = [None] * len(self.text) if cache_in_memory \
            else None

    def _process_meta(self, filename: str):
        names, speakers, texts, raw_texts = [], [], [], []
        with open(os.path.join(self.preprocessed_path, filename),
                  encoding="utf-8") as f:
            for line in f:
                n, s, t, r = line.strip("\n").split("|")
                if len(r) > self.max_text_length:
                    continue
                names.append(n)
                speakers.append(s)
                texts.append(t)
                raw_texts.append(r)
        return names, speakers, texts, raw_texts

    def _load_speaker_map(self):
        import json

        path = os.path.join(self.preprocessed_path, "speakers.json")
        if os.path.isfile(path):
            with open(path, encoding="utf-8") as f:
                loaded = json.load(f)
            # accept {"name": id} or {"name": [id, ...]} layouts
            return {k: (v[0] if isinstance(v, (list, tuple)) else int(v))
                    for k, v in loaded.items()}
        return {}

    @property
    def n_speakers(self) -> int:
        """Embedding-table size: max id + 1 (ids may be non-contiguous)."""
        if not self.speaker_map:
            return 1
        return max(1, max(self.speaker_map.values()) + 1)

    def __len__(self):
        return len(self.text)

    def _np(self, kind: str, idx: int) -> np.ndarray:
        return np.load(os.path.join(
            self.preprocessed_path, kind,
            f"{self.speaker[idx]}-{kind}-{self.basename[idx]}.npy"))

    def __getitem__(self, idx: int) -> Dict:
        if self._cache is not None and self._cache[idx] is not None:
            return self._cache[idx]
        item = {
            "phoneme": self.phonemes[idx],
            "text": self.raw_text[idx],
            "speaker": self.speaker_id[idx],
            "pitch": self._np("pitch", idx).astype(np.float32),
            "energy": self._np("energy", idx).astype(np.float32),
            "duration": self._np("duration", idx).astype(np.int32),
            "mel": self._np("mel", idx).astype(np.float32),
        }
        if self._cache is not None:
            self._cache[idx] = item
        return item


class BucketedLoader:
    """Length-bucketed batcher with static padded shapes + thread prefetch.

    Samples are sorted by phoneme length, grouped into contiguous batches
    (so similar lengths share a batch, like the reference's per-batch sort),
    then batch order is shuffled per epoch.  Each batch is padded to
    (phoneme bucket, mel bucket) rounded up to multiples of
    ``phoneme_multiple``/``mel_multiple`` — few distinct shapes ⇒ few XLA
    compilations.
    """

    def __init__(self, dataset: LJSpeechDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 phoneme_multiple: int = 32, mel_multiple: int = 256,
                 max_phoneme_len: Optional[int] = None,
                 max_mel_len: Optional[int] = None,
                 drop_last: bool = False,
                 prefetch: int = 2,
                 fixed_shape: bool = False):
        """fixed_shape: pad every batch to (max_phoneme_len, max_mel_len)
        instead of per-batch rounded maxima — ONE compiled program per batch
        size for the whole pass.  Use for validation, where remote compiles
        (minutes each on tunneled TPUs) would otherwise fire per shape."""
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.phoneme_multiple = phoneme_multiple
        self.mel_multiple = mel_multiple
        self.max_phoneme_len = max_phoneme_len
        self.max_mel_len = max_mel_len
        self.fixed_shape = fixed_shape
        if fixed_shape and not (max_phoneme_len and max_mel_len):
            raise ValueError("fixed_shape requires max_phoneme_len and "
                             "max_mel_len")
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

        lens = np.array([len(p) for p in dataset.phonemes])
        order = np.argsort(-lens, kind="stable")  # longest first
        self._batches: List[np.ndarray] = [
            order[i:i + batch_size]
            for i in range(0, len(order), batch_size)
        ]
        if drop_last and len(self._batches) > 1 and \
                len(self._batches[-1]) < batch_size:
            self._batches = self._batches[:-1]

    def __len__(self):
        return len(self._batches)

    def _assemble(self, idxs: np.ndarray) -> Dict:
        samples = [self.ds[int(i)] for i in idxs]
        # in-batch sort by descending phoneme length (reference:
        # datamodule.py:31-32)
        samples.sort(key=lambda s: -len(s["phoneme"]))
        b = len(samples)
        n_max = max(len(s["phoneme"]) for s in samples)
        m_max = max(s["mel"].shape[0] for s in samples)
        if self.fixed_shape:
            n_pad, m_pad = self.max_phoneme_len, self.max_mel_len
        else:
            n_pad = _round_up(n_max, self.phoneme_multiple)
            m_pad = _round_up(m_max, self.mel_multiple)
            if self.max_phoneme_len:
                n_pad = min(n_pad, self.max_phoneme_len)
            if self.max_mel_len:
                m_pad = min(m_pad, self.max_mel_len)

        phoneme = np.zeros((b, n_pad), np.int32)
        phoneme_mask = np.ones((b, n_pad), bool)
        pitch = np.zeros((b, n_pad), np.float32)
        energy = np.zeros((b, n_pad), np.float32)
        duration = np.zeros((b, n_pad), np.int32)
        mel = np.zeros((b, m_pad, samples[0]["mel"].shape[1]), np.float32)
        mel_mask = np.ones((b, m_pad), bool)
        speaker = np.asarray([s.get("speaker", 0) for s in samples],
                             np.int32)
        texts = []
        for i, s in enumerate(samples):
            n = min(len(s["phoneme"]), n_pad)
            phoneme[i, :n] = s["phoneme"][:n]
            phoneme_mask[i, :n] = False
            pitch[i, :n] = s["pitch"][:n]
            energy[i, :n] = s["energy"][:n]
            # Keep durations and the mel valid-region ALIGNED under
            # truncation (the reference never truncates, datamodule.py:29-76;
            # static buckets can).  Two cases: (a) phonemes cut at n_pad ⇒
            # the teacher-forced expansion is sum(duration[:n]) frames, so
            # mel frames beyond that have no source phoneme and must be
            # masked out of the loss; (b) mel cut at m_pad ⇒ durations are
            # clamped so their cumulative sum never exceeds the mel buffer.
            d = s["duration"][:n].astype(np.int64)
            prev = np.cumsum(d) - d  # exclusive prefix sum
            d = np.clip(np.minimum(d, m_pad - prev), 0, None)
            duration[i, :n] = d
            m = min(s["mel"].shape[0], m_pad, int(d.sum()))
            mel[i, :m] = s["mel"][:m]
            mel_mask[i, :m] = False
            texts.append(s["text"])
        return {
            "phoneme": phoneme, "phoneme_mask": phoneme_mask,
            "pitch": pitch, "energy": energy, "duration": duration,
            "mel": mel, "mel_mask": mel_mask, "speaker": speaker,
            "text": texts,
        }

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self._batches))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1

        if self.prefetch <= 0:
            for bi in order:
                yield self._assemble(self._batches[bi])
            return

        # bounded, order-preserving parallel prefetch: at TPU step rates the
        # single-threaded assembly would starve the device
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(2, self.prefetch)) as ex:
            pending = []
            it = iter(order)
            for bi in it:
                pending.append(ex.submit(
                    self._assemble, self._batches[bi]))
                if len(pending) >= self.prefetch + 1:
                    break
            for bi in it:
                yield pending.pop(0).result()
                pending.append(ex.submit(
                    self._assemble, self._batches[bi]))
            for f in pending:
                yield f.result()
