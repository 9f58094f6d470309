"""Neural G2P: model forward parity (numpy vs jax), trainability,
serving wrapper, front-door routing, and training-data protocol.

The model replaces the reference's ``g2p_en`` OOV fallback
(reference: synthesize.py:8,33-35) with an in-framework trained
char→phone transformer (VERDICT r4 next #1)."""

import json
import os

import numpy as np
import pytest

from efficientspeech_tpu.text import g2p_data as D
from efficientspeech_tpu.text import g2p_model as M


def test_vocab_roundtrip():
    src = M.encode_word("hello")
    assert src is not None and src.shape == (M.MAX_SRC,)
    assert list(src[:5]) == [M.CHAR_TO_ID[c] for c in "hello"]
    assert src[5] == M.CHAR_PAD

    tgt = M.encode_phones(["HH", "AH0", "L", "OW1"])
    assert tgt is not None and tgt[4] == M.PHONE_EOS
    assert M.tokens_to_phones(tgt) == ["HH", "AH0", "L", "OW1"]

    assert M.encode_word("x" * (M.MAX_SRC + 1)) is None
    assert M.encode_word("héllo") is None
    assert M.encode_phones(["NOT_A_PHONE"]) is None


def test_numpy_jax_forward_parity():
    """The SAME forward runs under numpy (serving) and jax (training);
    they must agree to float32 tolerance."""
    import jax.numpy as jnp

    p = M.init_params(3)
    pj = {k: jnp.asarray(v) for k, v in p.items()}
    src = np.stack([M.encode_word("parity"), M.encode_word("check")])
    tgt_in = np.full((2, 5), M.PHONE_BOS, np.int32)

    mem_n, mask_n = M.encoder(p, src, np)
    logits_n = M.decoder_logits(p, mem_n, mask_n, tgt_in, np)
    mem_j, mask_j = M.encoder(pj, jnp.asarray(src), jnp)
    logits_j = M.decoder_logits(pj, mem_j, mask_j, jnp.asarray(tgt_in),
                                jnp)
    np.testing.assert_allclose(logits_n, np.asarray(logits_j),
                               rtol=1e-4, atol=1e-4)


def test_param_budget():
    """Compact by design: sub-1M parameters (it trains on ~5k gold
    pairs; bigger memorizes)."""
    assert M.n_params(M.init_params(0)) < 1_000_000


def test_model_overfits_tiny_set():
    """8 pairs, 150 steps: greedy decode must reproduce every
    pronunciation exactly — the end-to-end trainability check."""
    import jax
    import jax.numpy as jnp
    import optax

    words = {
        "cat": ["K", "AE1", "T"], "dog": ["D", "AO1", "G"],
        "house": ["HH", "AW1", "S"], "tree": ["T", "R", "IY1"],
        "water": ["W", "AO1", "T", "ER0"],
        "stone": ["S", "T", "OW1", "N"],
        "light": ["L", "AY1", "T"], "dream": ["D", "R", "IY1", "M"],
    }
    src = np.stack([M.encode_word(w) for w in words]).astype(np.int32)
    tgt = np.stack([M.encode_phones(p) for p in words.values()]
                   ).astype(np.int32)

    p = {k: jnp.asarray(v) for k, v in M.init_params(0).items()}
    tx = optax.adam(3e-3)
    opt = tx.init(p)

    def loss_fn(p, rng):
        mem, mask = M.encoder(p, jnp.asarray(src), jnp)
        tin = jnp.concatenate(
            [jnp.full((len(words), 1), M.PHONE_BOS, jnp.int32),
             jnp.asarray(tgt[:, :-1])], axis=1)
        logits = M.decoder_logits(p, mem, mask, tin, jnp)
        valid = (jnp.asarray(tgt) != M.PHONE_PAD).astype(jnp.float32)
        nll = -jnp.take_along_axis(
            jax.nn.log_softmax(logits), jnp.asarray(tgt)[..., None],
            -1)[..., 0]
        return (nll * valid).sum() / valid.sum()

    @jax.jit
    def step(p, opt, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, rng)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, loss

    key = jax.random.PRNGKey(0)
    for i in range(150):
        key, sub = jax.random.split(key)
        p, opt, loss = step(p, opt, sub)
    p_np = {k: np.asarray(v) for k, v in p.items()}
    toks, conf = M.greedy_decode(p_np, src)
    for i, (w, ref) in enumerate(words.items()):
        assert M.tokens_to_phones(toks[i]) == ref, (
            w, M.tokens_to_phones(toks[i]), float(loss))
    assert float(np.min(conf)) > -0.5  # memorized → confident


def test_training_pairs_exclude_blind_sets():
    """PROTOCOL: no blind4 (validation) or blind5 (gate) word may
    appear in the neural training data — mechanical contamination
    guard, same spirit as test_blind_set_is_disjoint."""
    pairs = D.build_pairs(gold_repeat=1, n_compounds=500, n_prefixed=500)
    words = {w for w, _, _ in pairs}
    excl = D.excluded_words()
    assert len(excl) >= 1100  # both sets loaded
    assert not (words & excl), sorted(words & excl)[:10]


def test_inflection_phonology():
    """Deterministic allomorphy spot-checks (the augmentation labels
    must be right or the model learns wrong morphology)."""
    forms = dict()
    for w, p in [("make", ["M", "EY1", "K"]),
                 ("run", ["R", "AH1", "N"]),
                 ("horse", ["HH", "AO1", "R", "S"]),
                 ("carry", ["K", "EH1", "R", "IY0"]),
                 ("help", ["HH", "EH1", "L", "P"])]:
        for f, fp in D.inflections(w, p):
            forms[f] = fp
    assert forms["makes"] == ["M", "EY1", "K", "S"]
    assert forms["making"] == ["M", "EY1", "K", "IH0", "NG"]
    # regularized past of an irregular verb still teaches a correct
    # letter-string → sound mapping
    assert forms["maked"] == ["M", "EY1", "K", "T"]
    assert forms["runs"] == ["R", "AH1", "N", "Z"]
    assert forms["running"] == ["R", "AH1", "N", "IH0", "NG"]
    assert forms["runned"] == ["R", "AH1", "N", "D"]  # regularized
    assert forms["horses"] == ["HH", "AO1", "R", "S", "IH0", "Z"]
    assert forms["carries"] == ["K", "EH1", "R", "IY0", "Z"]
    assert forms["carried"] == ["K", "EH1", "R", "IY0", "D"]
    assert forms["helped"] == ["HH", "EH1", "L", "P", "T"]
    assert forms["helpful"] == ["HH", "EH1", "L", "P", "F", "AH0", "L"]


def _tiny_npz(tmp_path, threshold=-0.35):
    p = M.init_params(1)
    meta = {"route_threshold": threshold, "val_acc": 0.0}
    path = str(tmp_path / "tiny_g2p.npz")
    np.savez(path,
             __meta=np.frombuffer(json.dumps(meta).encode(),
                                  dtype=np.uint8),
             **{f"p_{k}": v for k, v in p.items()})
    return path


def test_wrapper_loads_and_decodes(tmp_path):
    from efficientspeech_tpu.text.neural_g2p import NeuralG2p

    g = NeuralG2p(_tiny_npz(tmp_path))
    phones, conf = g("hello")
    assert isinstance(phones, list) and np.isfinite(conf)
    for ph in phones:
        assert ph in M.PHONE_TO_ID
    # unencodable input degrades gracefully
    phones, conf = g("x" * 40)
    assert phones == [] and conf == float("-inf")
    # cache returns a copy, not an alias
    a, _ = g("hello")
    a.append("XX")
    b, _ = g("hello")
    assert b[-1:] != ["XX"]


def test_wrapper_threshold_routes(tmp_path):
    from efficientspeech_tpu.text.neural_g2p import NeuralG2p

    strict = NeuralG2p(_tiny_npz(tmp_path, threshold=0.0))
    assert strict.confident("hello") is None  # random params: low conf
    lax = NeuralG2p(_tiny_npz(tmp_path, threshold=-1e9))
    got = lax.confident("hello")
    assert got is None or isinstance(got, list)


def test_front_door_falls_back_without_checkpoint(monkeypatch):
    """A missing checkpoint must reproduce the rules-only chain
    exactly (fresh checkouts without the npz still work)."""
    from efficientspeech_tpu.text import neural_g2p
    from efficientspeech_tpu.text.g2p import G2p, rule_g2p

    monkeypatch.setattr(neural_g2p, "DEFAULT_PATH", "/nonexistent.npz")
    neural_g2p.reset_default_cache()
    try:
        g = G2p()
        assert g._neural is None
        # an OOV nonsense word must still produce rule output
        w = "zorblatt"
        assert g(w) == rule_g2p(w)
    finally:
        neural_g2p.reset_default_cache()


def test_front_door_uses_confident_neural(monkeypatch, tmp_path):
    """When the neural fallback is confident, the front door returns
    its phones; lexicon/derivation hits still win before it."""
    from efficientspeech_tpu.text.g2p import G2p

    g = G2p(use_neural=False)

    class Stub:
        def confident(self, w):
            return ["Z", "AO1", "R", "B"] if w == "zorblatt" else None

    g._neural = Stub()
    assert g("zorblatt") == ["Z", "AO1", "R", "B"]
    # lexicon word: neural never consulted
    assert g("the") == g._builtin["the"]
    # unconfident word: rules
    from efficientspeech_tpu.text.g2p import rule_g2p

    assert g("vexatious") == rule_g2p("vexatious")
