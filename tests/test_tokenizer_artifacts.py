"""Real tokenizer-artifact plumbing: FAST processor artifact load/save and
real-vocabulary text tokenizers from disk (VERDICT next-round item 7).

The actual hub artifacts are unavailable offline, so fixtures are written
in the SAME saved format (HF `tokenizers` tokenizer.json + processor
config) and loaded through the same code path real artifacts would use.
"""

import os

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from cover_vla_tpu.data.fast_tokenizer import (
    HubFastProcessor, normalize_actions_minmax)
from cover_vla_tpu.data.tokenizer import (
    FileTokenizer, HashTokenizer, make_policy_tokenizer,
    make_verifier_tokenizer)


def _corpus(n=64, t=8, d=7, seed=0):
    rng = np.random.default_rng(seed)
    # smooth action chunks (realistic: DCT energy concentrated in low freqs)
    base = rng.standard_normal((n, 1, d))
    ramp = np.linspace(-1, 1, t)[None, :, None] * rng.standard_normal(
        (n, 1, d)) * 0.3
    return normalize_actions_minmax(base + ramp)


def test_fast_processor_train_encode_decode():
    acts = _corpus()
    proc = HubFastProcessor.train(acts, vocab_size=400, scale=32.0)
    ids = proc(acts[:8])
    assert all(len(s) > 0 for s in ids)
    # BPE compresses below one token per DCT coefficient
    assert np.mean([len(s) for s in ids]) < acts.shape[1] * acts.shape[2]
    dec = proc.decode(ids)
    # reconstruction bounded by the quantisation step (0.5/scale per coeff)
    assert np.abs(dec - acts[:8]).max() < 0.5 / 32.0 * np.sqrt(8) * 4


def test_fast_artifact_roundtrip(tmp_path):
    """save_artifact -> from_artifact reproduces token ids and decode
    exactly (the saved processor/vocab file format loader)."""
    acts = _corpus(seed=1)
    proc = HubFastProcessor.train(acts, vocab_size=300, scale=16.0)
    art = str(tmp_path / "fast_artifact")
    proc.save_artifact(art)
    assert os.path.exists(os.path.join(art, "tokenizer.json"))
    assert os.path.exists(os.path.join(art, "processor_config.json"))

    loaded = HubFastProcessor.from_artifact(art)
    assert loaded.scale == 16.0
    assert loaded.vocab_size == proc.vocab_size
    batch = acts[:4]
    ids_a, ids_b = proc(batch), loaded(batch)
    assert ids_a == ids_b
    np.testing.assert_array_equal(proc.decode(ids_a), loaded.decode(ids_b))


def test_fast_decode_parity_on_recorded_sequence(tmp_path):
    """Decode parity on a recorded token sequence: tokens produced by one
    processor instance decode identically through a fresh artifact load."""
    acts = _corpus(n=16, seed=2)
    proc = HubFastProcessor.train(acts, vocab_size=280, scale=16.0)
    recorded = proc(acts[:2])
    expected = proc.decode(recorded)
    art = str(tmp_path / "art")
    proc.save_artifact(art)
    fresh = HubFastProcessor.from_artifact(art)
    got = fresh.decode(recorded, time_horizon=acts.shape[1],
                       action_dim=acts.shape[2])
    np.testing.assert_array_equal(got, expected)


def test_fast_relaxed_decode_truncates_and_pads():
    acts = _corpus(n=8, seed=3)
    proc = HubFastProcessor.train(acts, vocab_size=280, scale=16.0)
    ids = proc(acts[:1])[0]
    short = proc.decode([ids[:max(1, len(ids) // 2)]])
    assert short.shape == (1, acts.shape[1], acts.shape[2])
    assert np.isfinite(short).all()


def _make_word_bpe(tmp_path):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import Whitespace
    tok = Tokenizer(BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(vocab_size=200, special_tokens=["[UNK]"],
                         show_progress=False)
    tok.train_from_iterator(
        ["put the carrot on the plate", "put the spoon on the towel",
         "stack the green block on the yellow block"] * 4, trainer)
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    return path


def test_file_tokenizer_pi0_semantics(tmp_path):
    path = _make_word_bpe(tmp_path)
    tok = FileTokenizer(path, append_newline=True, add_bos=True)
    tokens, mask = tok.encode_batch(
        ["put the carrot on the plate", "stack the green block"], 16)
    assert tokens.shape == (2, 16) and mask.shape == (2, 16)
    assert tokens[0, 0] == 2  # BOS
    assert mask[0].sum() > 2
    # padding: masked-off positions are pad_id
    assert (tokens[0][~mask[0]] == 0).all()
    # deterministic
    tokens2, _ = tok.encode_batch(
        ["put the carrot on the plate", "stack the green block"], 16)
    np.testing.assert_array_equal(tokens, tokens2)


def test_make_policy_tokenizer_prefers_real_vocab(tmp_path):
    """A bare tokenizer.json on disk replaces the hash fallback; a full
    transformers save_pretrained dir goes through AutoTokenizer."""
    path = _make_word_bpe(tmp_path)
    tok = make_policy_tokenizer(1024, hf_path=path)
    assert isinstance(tok, FileTokenizer)

    # full transformers dir -> HFTokenizer (AutoTokenizer local load)
    from tokenizers import Tokenizer
    from transformers import PreTrainedTokenizerFast
    hf_dir = str(tmp_path / "hf_tok")
    PreTrainedTokenizerFast(
        tokenizer_object=Tokenizer.from_file(path),
        pad_token="[UNK]").save_pretrained(hf_dir)
    tok2 = make_policy_tokenizer(1024, hf_path=hf_dir)
    from cover_vla_tpu.data.tokenizer import HFTokenizer
    assert isinstance(tok2, HFTokenizer)
    tokens, mask = tok2.encode_batch(["put the carrot on the plate"], 12)
    assert tokens.shape == (1, 12)
    assert mask[0].sum() > 0

    # missing artifacts -> deterministic hash fallback
    tok3 = make_policy_tokenizer(1024, hf_path="/nonexistent/path")
    assert isinstance(tok3, HashTokenizer)
    tok4 = make_verifier_tokenizer(512, hf_path=path)
    assert isinstance(tok4, FileTokenizer)
    assert tok4.append_newline is False
