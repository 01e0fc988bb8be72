"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer built from the
same (tiny, locally constructed) vocab files — no network."""
import json

import numpy as np
import pytest

from dclip_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer, bytes_to_unicode


def _tiny_vocab_files(tmp_path):
    """Build a small but real BPE vocab: all byte symbols + </w> variants +
    a few merges, exactly the file formats HF CLIPTokenizer reads."""
    base = list(bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in base:
        vocab[ch + "</w>"] = len(vocab)
    merges = [
        ("t", "h"),
        ("th", "e</w>"),
        ("a", "n"),
        ("an", "d</w>"),
        ("c", "a"),
        ("ca", "t</w>"),
        ("d", "o"),
        ("do", "g</w>"),
        ("i", "n"),
        ("r", "u"),
        ("ru", "n"),
    ]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(vocab_file), str(merges_file)


TEXTS = [
    "the cat and the dog run in the park",
    "A Photo of a CAT!",
    "punctuation, everywhere... and-dashes",
    "  extra   whitespace \t here ",
    "the quick brown fox jumps over 12 lazy dogs",
]


def test_parity_with_hf_clip_tokenizer(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab_file, merges_file = _tiny_vocab_files(tmp_path)
    hf = transformers.CLIPTokenizer(vocab_file=vocab_file, merges_file=merges_file)
    ours = CLIPTokenizer.from_files(vocab_file, merges_file, max_length=77)
    for text in TEXTS:
        want = hf(text, padding="max_length", max_length=77, truncation=True)
        ids, mask = ours.encode(text)
        assert ids.tolist() == want["input_ids"], text
        assert mask.tolist() == want["attention_mask"], text


def test_truncation_keeps_eos(tmp_path):
    pytest.importorskip("transformers")
    vocab_file, merges_file = _tiny_vocab_files(tmp_path)
    ours = CLIPTokenizer.from_files(vocab_file, merges_file, max_length=8)
    ids, mask = ours.encode("the cat and the dog run in the park again and again")
    assert ids.shape == (8,)
    assert ids[0] == ours.bos_token_id
    assert ids[7] == ours.eos_token_id
    assert mask.sum() == 8


def test_decode_roundtrip(tmp_path):
    vocab_file, merges_file = _tiny_vocab_files(tmp_path)
    ours = CLIPTokenizer.from_files(vocab_file, merges_file)
    ids = ours.tokenize("the cat and dog")
    assert ours.decode(ids) == "the cat and dog"


def test_split_into_chunks(tmp_path):
    vocab_file, merges_file = _tiny_vocab_files(tmp_path)
    ours = CLIPTokenizer.from_files(vocab_file, merges_file, max_length=10)
    text = "the cat and the dog run in the park " * 5
    chunks = ours.split_into_chunks(text)
    assert len(chunks) > 1
    for c in chunks:
        assert len(ours.tokenize(c)) <= 8  # limit - BOS/EOS
    assert " ".join(chunks).split() == text.split()


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=100, max_length=8)
    a1, m1 = tok.encode("hello world")
    a2, m2 = tok.encode("hello world")
    np.testing.assert_array_equal(a1, a2)
    assert a1[0] == 98 and m1.sum() == 4  # BOS + 2 words + EOS
    ids, _ = tok.encode_batch(["a b", "c"])
    assert ids.shape == (2, 8)


def test_gz_merges_truncation_matches_openai(tmp_path):
    """OpenAI's simple_tokenizer keeps merges[1:49152-256-2+1] = 48,894
    rules from bpe_simple_vocab_16e6.txt.gz. One extra rule would produce
    a merged token absent from the 49,408-entry vocab (KeyError at encode
    time whenever that merge fires)."""
    import gzip

    base = list(bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in base:
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    # Synthetic merges file LONGER than the cap; only the first 48,894
    # post-header rules may load.
    n_rules = 49152 - 256 - 2 + 50
    lines = ["bpe_simple_vocab_16e6"]  # header line
    lines += [f"tok{i} tok{i}x" for i in range(n_rules)]
    merges_file = tmp_path / "merges.txt.gz"
    with gzip.open(merges_file, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    vocab_file = tmp_path / "vocab.json"
    vocab_file.write_text(json.dumps(vocab))
    tok = CLIPTokenizer.from_files(str(vocab_file), str(merges_file))
    assert len(tok.bpe_ranks) == 49152 - 256 - 2  # 48,894 — not 48,895


@pytest.mark.slow
def test_fuzz_parity_with_hf_clip_tokenizer(tmp_path):
    """Property fuzz: 150 random strings over a hostile character pool
    (unicode, emoji, CJK, mixed whitespace, punctuation runs) must encode
    id-identically to transformers.CLIPTokenizer. Bit-comparable eval
    numbers (BASELINE.md) depend on this holding for arbitrary captions."""
    import random

    transformers = pytest.importorskip("transformers")
    vocab_file, merges_file = _tiny_vocab_files(tmp_path)
    hf = transformers.CLIPTokenizer(vocab_file=vocab_file,
                                    merges_file=merges_file)
    ours = CLIPTokenizer.from_files(vocab_file, merges_file, max_length=77)
    pool = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n  .,!?;:'\"-()[]/&%$#@*+=<>"
        "àéîöüñçßøæœ"
        "日本語中文한국어"
        "🙂🚀🐈"
        "​ "  # zero-width space, nbsp
    )
    rng = random.Random(42)
    for i in range(150):
        n = rng.randint(0, 40)
        text = "".join(rng.choice(pool) for _ in range(n))
        want = hf(text, padding="max_length", max_length=77, truncation=True)
        ids, mask = ours.encode(text)
        assert ids.tolist() == want["input_ids"], (i, repr(text))
        assert mask.tolist() == want["attention_mask"], (i, repr(text))
