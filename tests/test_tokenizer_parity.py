"""Tokenizer parity vs HuggingFace implementations.

Round-1 verdict item 2c: ``CLIPBPETokenizer`` (the exact-BPE path real
CLIP weights require, reference ``openclip_model.py:204`` via
``open_clip.tokenize``) and ``WordPieceTokenizer`` (BLIP text side) had
zero tests. Gold standard here: construct a small merges/vocab, load it
into BOTH our implementation and the HF reference tokenizer
(``CLIPTokenizer`` / ``BertTokenizer`` implement the same algorithms as
open_clip/BLIP), and require identical ids on a battery of strings —
contractions, punctuation, numbers, unicode, whitespace.
"""

import json

import pytest

transformers = pytest.importorskip("transformers")

MERGES = [
    "t h", "th e</w>", "a n", "an d</w>", "c a", "ca t</w>",
    "ca t", "d o", "do g", "dog</w>", "i n</w>", "o n</w>",
    "e r", "er e</w>", "w h", "wh ere</w>", "r e", "re d</w>",
    "cat s</w>", "dog s</w>", "1 2</w>", "' s</w>", "i ng</w>",
    "n g", "r un", "u n", "run n", "runn ing</w>",
]


@pytest.fixture(scope="module")
def bpe_pair(tmp_path_factory):
    """(ours, hf) CLIP tokenizers built from the same merges."""
    from avede_tpu.models.tokenizer import CLIPBPETokenizer

    d = tmp_path_factory.mktemp("bpe")
    merges_path = d / "merges.txt"
    merges_path.write_text(
        "#version: 0.2\n" + "\n".join(MERGES) + "\n", "utf-8")
    ours = CLIPBPETokenizer(str(merges_path))

    # HF needs the vocab as json; ours builds it from the merges file
    # with the canonical open_clip ordering — dump it verbatim.
    vocab_path = d / "vocab.json"
    vocab_path.write_text(json.dumps(ours.encoder), "utf-8")
    hf = transformers.CLIPTokenizer(str(vocab_path), str(merges_path))
    return ours, hf


BATTERY = [
    "the cat and the dog",
    "a cat",
    "cats and dogs running",
    "Don't stop, it's 12 o'clock!",
    "WHERE are THE red CATS?",
    "punctuation... (lots); of/it -- here!",
    "numbers 12 345 6789",
    "héllo wörld — café",      # unicode letters + em-dash
    "  multiple   spaces\tand\nnewlines  ",
    "emoji \U0001f600 mix",
    "the<|endoftext|>the",  # special token inline
    "'s 't 're 've 'm 'll 'd",  # every contraction branch
]


class TestCLIPBPEParity:
    @pytest.mark.parametrize("text", BATTERY)
    def test_encode_matches_hf(self, bpe_pair, text):
        ours, hf = bpe_pair
        got = ours.encode(text)
        ref = hf(text, add_special_tokens=False)["input_ids"]
        assert got == ref, f"{text!r}: ours={got} hf={ref}"

    def test_known_encoding(self, bpe_pair):
        """Hand-checked: 'the cat' → merged whole-word tokens."""
        ours, _ = bpe_pair
        ids = ours.encode("the cat")
        toks = {v: k for k, v in ours.encoder.items()}
        assert [toks[i] for i in ids] == ["the</w>", "cat</w>"]

    def test_unmerged_word_falls_back_to_bytes(self, bpe_pair):
        ours, hf = bpe_pair
        got = ours.encode("zyx")
        ref = hf("zyx", add_special_tokens=False)["input_ids"]
        assert got == ref
        assert len(got) == 3  # no merges cover it → per-byte(+</w>)

    def test_special_token_ids(self, bpe_pair):
        ours, _ = bpe_pair
        assert ours.eot == ours.vocab_size - 1  # max id → argmax pooling
        assert ours.sot == ours.vocab_size - 2

    def test_front_end_framing(self, bpe_pair, tmp_path):
        """Tokenizer front-end with a real BPE: SOT/EOT framing, padding,
        truncation, argmax pooling contract."""
        from avede_tpu.models.tokenizer import Tokenizer

        ours, _ = bpe_pair
        merges = tmp_path / "m.txt"
        merges.write_text("#version: 0.2\n" + "\n".join(MERGES), "utf-8")
        tok = Tokenizer(bpe_path=str(merges), context_len=16)
        out = tok(["the cat and the dog", ""])
        assert out.shape == (2, 16)
        assert (out[:, 0] == tok.sot).all()
        for row in out:
            assert tok.eot in row
            assert row.argmax() == list(row).index(tok.eot)
        long = tok("cats and dogs " * 50)
        assert long.shape == (1, 16)
        assert long[0, -1] == tok.eot  # truncated but still EOT-framed


WP_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "cat", "##s",
            "play", "##ing", "in", "gar", "##den", "a", "dog", "run",
            "##ning", "red"]


@pytest.fixture(scope="module")
def wp_pair(tmp_path_factory):
    from avede_tpu.models.tokenizer import WordPieceTokenizer

    d = tmp_path_factory.mktemp("wp")
    vocab_path = d / "vocab.txt"
    vocab_path.write_text("\n".join(WP_VOCAB) + "\n", "utf-8")
    ours = WordPieceTokenizer(str(vocab_path))
    hf = transformers.BertTokenizer(str(vocab_path))
    return ours, hf


class TestWordPieceParity:
    @pytest.mark.parametrize("text", [
        "the cats playing in the garden",
        "a dog running",
        "The RED cat",
        "unknownword the cat",
        "gardens",
    ])
    def test_encode_matches_hf(self, wp_pair, text):
        ours, hf = wp_pair
        got = ours.encode(text)
        ref = hf(text, add_special_tokens=False)["input_ids"]
        assert got == ref, f"{text!r}: ours={got} hf={ref}"

    def test_roundtrip(self, wp_pair):
        ours, _ = wp_pair
        text = "the cats playing in the garden"
        assert ours.decode(ours.encode(text)) == text

    def test_decode_skips_specials_and_merges_continuations(self, wp_pair):
        ours, _ = wp_pair
        v = {w: i for i, w in enumerate(WP_VOCAB)}
        ids = [v["[CLS]"], v["the"], v["cat"], v["##s"], v["[SEP]"],
               v["[PAD]"]]
        assert ours.decode(ids) == "the cats"


class TestBundledAssets:
    """The committed tokenizer data (avede_tpu/assets/, built by
    tools/build_tokenizer_assets.py) must load through the real
    implementations, match HF given the same files, and be the product
    default (no more hash-tokenizer fallback at full geometry)."""

    def test_bundled_bpe_is_default_and_matches_hf(self, tmp_path):
        import gzip

        from avede_tpu.models.tokenizer import CLIPBPETokenizer, Tokenizer
        from avede_tpu.utils.config import settings

        assert settings.TOKENIZER_VOCAB, "bundled merges not configured"
        t = Tokenizer()  # full-size default (vocab 49408)
        assert isinstance(t.impl, CLIPBPETokenizer), \
            "product default fell back to hash tokenizer"

        # HF parity on the SHIPPED merges: same ids for English text
        merges_txt = gzip.open(settings.TOKENIZER_VOCAB, "rt",
                               encoding="utf-8").read()
        (tmp_path / "merges.txt").write_text(merges_txt, "utf-8")
        (tmp_path / "vocab.json").write_text(
            json.dumps(t.impl.encoder), "utf-8")
        hf = transformers.CLIPTokenizer(str(tmp_path / "vocab.json"),
                                        str(tmp_path / "merges.txt"))
        for text in ["a person walking a dog on the beach",
                     "red car driving fast, 42 mph!",
                     "the quick brown fox jumps over the lazy dog"]:
            ours = t.impl.encode(text)
            ref = hf(text, add_special_tokens=False)["input_ids"]
            assert ours == ref, f"{text!r}: ours={ours} hf={ref}"

    def test_bundled_bpe_framing_contract(self):
        from avede_tpu.models.tokenizer import Tokenizer

        t = Tokenizer()
        ids = t(["a person on the beach"])
        row = ids[0][ids[0] > 0]
        assert row[0] == t.sot and row[-1] == t.eot
        # EOT is the max id → HF-style argmax(ids) pooling finds it
        assert t.eot == int(ids[0].max())

    def test_bundled_wordpiece_matches_hf_and_blip_layout(self, tmp_path):
        import gzip

        from avede_tpu.models.blip import BlipConfig
        from avede_tpu.models.tokenizer import WordPieceTokenizer
        from avede_tpu.utils.config import settings

        assert settings.BLIP_VOCAB, "bundled vocab not configured"
        tok = WordPieceTokenizer(settings.BLIP_VOCAB)
        cfg = BlipConfig()
        assert len(tok.inv) == cfg.vocab_size
        assert tok.vocab["[PAD]"] == cfg.pad_token_id == 0
        assert tok.vocab["[UNK]"] == 100
        assert tok.vocab["[CLS]"] == 101
        assert tok.vocab["[SEP]"] == cfg.eos_token_id == 102
        assert tok.vocab["[DEC]"] == cfg.bos_token_id == 30522

        vocab_txt = gzip.open(settings.BLIP_VOCAB, "rt",
                              encoding="utf-8").read()
        (tmp_path / "vocab.txt").write_text(vocab_txt, "utf-8")
        hf = transformers.BertTokenizer(str(tmp_path / "vocab.txt"))
        for text in ["a person walking a dog on the beach",
                     "unknownxyzq word then the cat"]:
            ours = tok.encode(text)
            ref = hf(text, add_special_tokens=False)["input_ids"]
            assert ours == ref, f"{text!r}: ours={ours} hf={ref}"
        assert "person" in tok.decode(tok.encode("a person walking"))

    def test_full_size_caption_service_uses_wordpiece(self):
        from avede_tpu.models.blip import BlipConfig
        from avede_tpu.models.tokenizer import WordPieceTokenizer
        from avede_tpu.services.captioner import _wordpiece_for
        from avede_tpu.models.qformer import QFormerConfig

        assert isinstance(
            _wordpiece_for(None, BlipConfig().vocab_size, "decode"),
            WordPieceTokenizer)
        assert isinstance(
            _wordpiece_for(None, QFormerConfig().vocab_size, "encode"),
            WordPieceTokenizer)
        # tiny test geometry must keep the hash fallback (ids would
        # otherwise clamp/blank)
        assert _wordpiece_for(None, 100, "decode") is None
