"""Build the bundled tokenizer assets from local English text.

The image ships no pretrained assets (no ``bpe_simple_vocab_16e6``, no
BERT ``vocab.txt``), so the product used to fall back to the hash
tokenizer at runtime. This tool LEARNS compact real tokenizer data from
text available in the image — Python stdlib docstrings, this repo's own
documentation, and a curated video-domain word list — using the same
parity-tested machinery that loads them (``models/tokenizer.py``):

- ``avede_tpu/assets/clip_bpe_merges.txt.gz`` — byte-pair-encoding
  merges in the exact ``bpe_simple_vocab_16e6.txt.gz`` file format the
  reference's ``open_clip.tokenize`` consumes
  (``/root/reference/src/models/openclip_model.py:204``), learned with
  the classic BPE algorithm over the corpus word frequencies.
- ``avede_tpu/assets/blip_wordpiece_vocab.txt`` — a BERT-layout
  WordPiece vocab (30524 lines: [PAD]=0, [UNK]=100, [CLS]=101,
  [SEP]=102, [MASK]=103, [DEC]=30522, [ENC]=30523 — the id contract in
  ``models/blip.py:39-52``), with pieces derived by segmenting the
  corpus with the learned merges.

Run: ``python tools/build_tokenizer_assets.py`` (writes into
``avede_tpu/assets/``; deterministic given the same interpreter).
"""

from __future__ import annotations

import gzip
import re
import sys
from collections import Counter, defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from avede_tpu.models.tokenizer import (  # noqa: E402
    _WORD_PAT, basic_clean, bytes_to_unicode, whitespace_clean)

ASSETS = REPO / "avede_tpu" / "assets"
N_MERGES = 12000
BLIP_VOCAB_SIZE = 30524          # models/blip.py:39 (BERT + [DEC]/[ENC])

# video-domain seed vocabulary: query/caption words every pipeline mode
# actually sees (colors, objects, actions, scenes) — weighted so the
# merges learn them whole even against the much larger stdlib corpus
DOMAIN_WORDS = """
person people man woman child dog cat car truck bicycle motorcycle bus
train boat airplane bird horse cow sheep elephant bear zebra giraffe
backpack umbrella handbag suitcase frisbee ball kite bat glove
skateboard surfboard racket bottle glass cup fork knife spoon bowl
banana apple sandwich orange broccoli carrot pizza donut cake chair
sofa plant bed table toilet television laptop mouse remote keyboard
phone microwave oven toaster sink refrigerator book clock vase
scissors teddy bear drier toothbrush red green blue yellow orange
purple pink black white gray brown dark bright light walking running
jumping sitting standing riding driving flying swimming eating
drinking talking playing holding carrying wearing throwing catching
kicking opening closing entering leaving falling dancing cooking
reading writing watching looking smiling waving pointing pushing
pulling climbing crossing street road building house tree grass sky
water beach mountain field park room kitchen office crowd group video
frame scene clip camera footage square circle triangle rectangle star
small large tiny huge moving static fast slow left right top bottom
center background foreground object event timestamp second minute
a the of in on at with near behind front above below between during
""".split()


def _stdlib_docs() -> str:
    """English text from stdlib module/class/function docstrings."""
    import inspect

    chunks = []
    names = sorted(getattr(sys, "stdlib_module_names", []))
    for name in names:
        if name.startswith("_"):
            continue
        try:
            mod = __import__(name)
        except Exception:  # noqa: BLE001 — platform-gated modules
            continue
        if mod.__doc__:
            chunks.append(mod.__doc__)
        for attr in list(vars(mod).values())[:400]:
            doc = getattr(attr, "__doc__", None)
            if isinstance(doc, str) and doc and doc is not type.__doc__:
                chunks.append(doc)
            if inspect.isclass(attr):
                for m in list(vars(attr).values())[:50]:
                    d = getattr(m, "__doc__", None)
                    if isinstance(d, str) and d:
                        chunks.append(d)
    return "\n".join(chunks)


def _repo_docs() -> str:
    chunks = []
    for pattern in ("*.md", "docs/*.md"):
        for p in sorted(REPO.glob(pattern)):
            try:
                chunks.append(p.read_text("utf-8"))
            except OSError:
                continue
    return "\n".join(chunks)


def build_corpus() -> Counter:
    """token → frequency, tokens produced by the EXACT CLIP pre-BPE
    pattern so the learned merges see the same units ``encode`` will."""
    text = _stdlib_docs() + "\n" + _repo_docs()
    text = whitespace_clean(basic_clean(text)).lower()
    freq: Counter = Counter()
    word_re = re.compile(r"^[a-z']+$")
    for tok in _WORD_PAT.findall(text):
        # keep natural-language tokens; drop identifiers_with_underscores
        # and long punctuation runs that would pollute the merges
        if word_re.match(tok) or (len(tok) == 1 and not tok.isalpha()):
            freq[tok] += 1
    for w in DOMAIN_WORDS:
        freq[w] += 2000          # outweigh stdlib jargon
    return freq


def learn_bpe(freq: Counter, n_merges: int):
    """Classic BPE: repeatedly merge the most frequent symbol pair.

    Incremental pair-count maintenance (pair → count, pair → words
    containing it) keeps this O(n_merges × touched-words)."""
    byte_enc = bytes_to_unicode()
    words = {}                    # word -> list of symbols
    wfreq = {}
    for tok, f in freq.items():
        enc = "".join(byte_enc[b] for b in tok.encode("utf-8"))
        if len(enc) < 2:
            continue
        sym = list(enc[:-1]) + [enc[-1] + "</w>"]
        words[tok] = sym
        wfreq[tok] = f

    pair_count: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for tok, sym in words.items():
        f = wfreq[tok]
        for p in zip(sym[:-1], sym[1:]):
            pair_count[p] += f
            pair_words[p].add(tok)

    merges = []
    for _ in range(n_merges):
        if not pair_count:
            break
        # deterministic tie-break: highest count, then lexicographic
        best = max(pair_count.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_count[best] < 2:
            break
        merges.append(best)
        first, second = best
        merged = first + second
        for tok in list(pair_words[best]):
            sym = words[tok]
            f = wfreq[tok]
            # remove old pair contributions for this word
            for p in zip(sym[:-1], sym[1:]):
                pair_count[p] -= f
                if pair_count[p] <= 0:
                    del pair_count[p]
                pair_words[p].discard(tok)
            # apply the merge
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == first
                        and sym[i + 1] == second):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[tok] = out
            for p in zip(out[:-1], out[1:]):
                pair_count[p] += f
                pair_words[p].add(tok)
    return merges, words, wfreq


def write_clip_merges(merges) -> Path:
    ASSETS.mkdir(parents=True, exist_ok=True)
    path = ASSETS / "clip_bpe_merges.txt.gz"
    header = ("#version: 0.2 - avede_tpu compact merges learned from "
              "local English text (tools/build_tokenizer_assets.py)")
    body = "\n".join(f"{a} {b}" for a, b in merges)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(header + "\n" + body + "\n")
    return path


def write_wordpiece_vocab(words, wfreq) -> Path:
    """BERT-layout vocab.txt with pieces from the BPE segmentation."""
    piece_freq: Counter = Counter()
    for tok, sym in words.items():
        f = wfreq[tok]
        if not tok.isalpha():
            continue
        for i, s in enumerate(sym):
            s = s.replace("</w>", "")
            if not s:
                continue
            piece_freq[s if i == 0 else "##" + s] += f
    # guaranteed coverage: every printable ascii char as its own piece
    chars = [chr(c) for c in range(33, 127)] + list("abcdefghijklmnopqrstuvwxyz0123456789")
    base = []
    for c in dict.fromkeys(chars):
        base.append(c)
        if c.isalnum():
            base.append("##" + c)

    vocab = ["[PAD]"]
    vocab += [f"[unused{i}]" for i in range(99)]          # 1..99
    vocab += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]        # 100..103
    seen = set(vocab)
    for piece in base:
        if piece not in seen:
            vocab.append(piece)
            seen.add(piece)
    budget = BLIP_VOCAB_SIZE - 2                          # leave DEC/ENC
    for piece, _ in piece_freq.most_common():
        if len(vocab) >= budget:
            break
        if piece not in seen:
            vocab.append(piece)
            seen.add(piece)
    n_unused = 0
    while len(vocab) < budget:
        vocab.append(f"[unusedx{n_unused}]")
        n_unused += 1
    vocab += ["[DEC]", "[ENC]"]                           # 30522, 30523
    assert len(vocab) == BLIP_VOCAB_SIZE
    path = ASSETS / "blip_wordpiece_vocab.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(vocab))
    return path


def main() -> None:
    freq = build_corpus()
    print(f"corpus: {len(freq)} unique tokens, "
          f"{sum(freq.values())} total")
    merges, words, wfreq = learn_bpe(freq, N_MERGES)
    p1 = write_clip_merges(merges)
    print(f"wrote {p1} ({len(merges)} merges, "
          f"vocab {512 + len(merges) + 2})")
    p2 = write_wordpiece_vocab(words, wfreq)
    print(f"wrote {p2} ({BLIP_VOCAB_SIZE} entries)")

    # smoke: round-trip through the real loaders
    from avede_tpu.models.tokenizer import (CLIPBPETokenizer,
                                            WordPieceTokenizer)

    bpe = CLIPBPETokenizer(str(p1))
    ids = bpe.encode("a person walking a dog on the beach")
    assert ids and max(ids) < bpe.vocab_size
    print(f"BPE smoke: {len(ids)} ids for 8 words "
          f"(vocab {bpe.vocab_size})")
    wp = WordPieceTokenizer(str(p2))
    enc = wp.encode("a person walking a dog on the beach")
    assert wp.unk == 100 and wp.vocab["[CLS]"] == 101 \
        and wp.vocab["[SEP]"] == 102 and wp.vocab["[DEC]"] == 30522
    dec = wp.decode(enc)
    assert "person" in dec and "beach" in dec, dec
    print(f"WordPiece smoke: {enc[:8]}... -> {dec!r}")


if __name__ == "__main__":
    main()
