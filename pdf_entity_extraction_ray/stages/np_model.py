"""Pure-numpy token-classification model + tagger (runnable A1 fixture).

The reference's day-one path loads a real HF token-classification
checkpoint (src/methods/NERTransformerModel.py:19-22); this module makes
that integration line EXECUTABLE in this sandbox: a small neural token
classifier (hashed sparse features -> embedding mean-pool -> ReLU ->
softmax over BIO labels) whose weights are a committed ``.npz``
checkpoint trained by ``scripts/train_np_tagger.py`` with deterministic
numpy SGD.  The forward pass emits HF-pipeline-shaped piece dicts
(``{"entity": "B-PER…", "word", "start", "end", "score"}``) including
``##``-continuation subword pieces, so the EXACT production chain runs:
pipe -> M4 ``bio_merge`` -> M5 whitelist -> M7 dedup -> M6 overlap
removal (src/methods/NERTransformerModel.py:24-70).

This is not a stub: inference is a real matrix forward pass over learned
weights; swap the checkpoint for a BERT-sized one (or the transformers
pipeline in stages/hf_tagger.py) and nothing downstream changes.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np

from ..functions.spans import bio_merge, dedup_spans, filter_types, remove_overlapping
from .registry import register_tagger
from .tagger import GazetteerTagger

DEFAULT_CHECKPOINT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "np_tagger.npz",
)

# raw whitespace tokens, then punctuation detachment (below)
_WS_TOKEN_RE = re.compile(r"\S+")
_TRAILING_PUNCT = ",.;:!?)\"'»”"
_LEADING_PUNCT = "(\"'«“"
_INITIAL_RE = re.compile(r"^\w\.$")  # "P." — period is part of the token
_SUBWORD_HEAD = 6  # words longer than HEAD+TAIL split into ##-pieces
_SUBWORD_TAIL = 4


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """Whitespace tokens with char offsets, with sentence punctuation
    detached into its own tokens — EXCEPT single-letter initials
    ("O.") and numbers with embedded separators ("14,5"), whose
    punctuation belongs to the token.  Deterministic; offsets index the
    original string so merged spans slice back out exactly."""
    out: list[tuple[str, int, int]] = []
    for m in _WS_TOKEN_RE.finditer(text):
        tok, s = m.group(0), m.start()
        # detach leading punctuation
        while len(tok) > 1 and tok[0] in _LEADING_PUNCT:
            out.append((tok[0], s, s + 1))
            tok, s = tok[1:], s + 1
        # detach trailing punctuation (repeatedly: "Paris)." -> ) .)
        tail: list[tuple[str, int, int]] = []
        while (
            len(tok) > 1
            and tok[-1] in _TRAILING_PUNCT
            and not _INITIAL_RE.match(tok)
            and not (tok[-1] == "." and len(tok) == 2)  # lone "X." initials
        ):
            tail.append((tok[-1], s + len(tok) - 1, s + len(tok)))
            tok = tok[:-1]
        if tok:
            out.append((tok, s, s + len(tok)))
        out.extend(reversed(tail))
    return out


def subword_pieces(tok: str, start: int) -> list[tuple[str, int, int, bool]]:
    """(piece_text, start, end, is_continuation) — words longer than
    HEAD+TAIL split WordPiece-style so the ``##`` branch of bio_merge
    (contiguous same-label pieces, no joining space) actually executes."""
    if len(tok) <= _SUBWORD_HEAD + _SUBWORD_TAIL:
        return [(tok, start, start + len(tok), False)]
    pieces = [(tok[:_SUBWORD_HEAD], start, start + _SUBWORD_HEAD, False)]
    pos = _SUBWORD_HEAD
    while pos < len(tok):
        chunk = tok[pos : pos + _SUBWORD_TAIL]
        pieces.append((chunk, start + pos, start + pos + len(chunk), True))
        pos += len(chunk)
    return pieces


def _h(feature: str, v: int) -> int:
    """Stable feature hash (blake2b, not Python's randomized hash)."""
    return int.from_bytes(hashlib.blake2b(feature.encode(), digest_size=4).digest(), "little") % v


def _word_shape(tok: str) -> str:
    return "".join(
        (
            "T" if tok[:1].istitle() else "x",
            "U" if tok.isupper() else "x",
            "D" if any(c.isdigit() for c in tok) else "x",
            "P" if "." in tok else "x",
            str(min(len(tok), 8)),
        )
    )


def featurize_segment(text: str, v: int) -> tuple[list[list[int]], list[tuple[str, int, int, bool]]]:
    """All pieces of one segment + each piece's hashed feature indices.
    Context features (prev/next WORD) make B- vs I- learnable."""
    toks = tokenize(text)
    pieces: list[tuple[str, int, int, bool]] = []
    piece_word: list[int] = []  # parent word index per piece
    for wi, (tok, s, _e) in enumerate(toks):
        for p in subword_pieces(tok, s):
            pieces.append(p)
            piece_word.append(wi)
    feats: list[list[int]] = []
    words = [t[0] for t in toks]
    lowers = [w.lower() for w in words]
    for (ptext, _s, _e, cont), wi in zip(pieces, piece_word):
        w, lw = words[wi], lowers[wi]
        prev = lowers[wi - 1] if wi > 0 else "<s>"
        nxt = lowers[wi + 1] if wi + 1 < len(words) else "</s>"
        f = [
            _h("w:" + lw, v),
            _h("p:" + ptext.lower(), v),
            _h("prev:" + prev, v),
            _h("next:" + nxt, v),
            _h("shape:" + _word_shape(w), v),
            _h("pshape:" + _word_shape(words[wi - 1]) if wi > 0 else "pshape:<s>", v),
            _h("bi:" + prev + "\x00" + lw, v),
            _h("cont:" + ("1" if cont else "0"), v),
        ]
        padded = "\x00" + lw + "\x00"
        for i in range(min(len(padded) - 2, 6)):
            f.append(_h("3g:" + padded[i : i + 3], v))
        feats.append(f)
    return feats, pieces


class NumpyTokenClassificationModel:
    """Loads a committed .npz checkpoint; __call__(text) -> piece dicts."""

    def __init__(self, checkpoint_path: str = DEFAULT_CHECKPOINT):
        z = np.load(checkpoint_path, allow_pickle=False)
        self.E = z["E"].astype(np.float32)        # [V, H] feature embeddings
        self.W2 = z["W2"].astype(np.float32)      # [H, L]
        self.b2 = z["b2"].astype(np.float32)      # [L]
        self.Wlin = z["Wlin"].astype(np.float32)  # [V, L] direct sparse term
        self.labels = [str(x) for x in z["labels"]]
        self.V = self.E.shape[0]

    def forward_logits(self, feats: list[list[int]]) -> np.ndarray:
        """logits = ReLU(mean-pooled embeddings) @ W2 + b2 + Σ Wlin[f] —
        a wide-and-deep token classifier: the direct sparse term carries
        vocabulary memory, the embedding pathway shares statistical
        strength across hashed features."""
        pooled = np.zeros((len(feats), self.E.shape[1]), dtype=np.float32)
        lin = np.zeros((len(feats), self.W2.shape[1]), dtype=np.float32)
        for i, f in enumerate(feats):
            pooled[i] = self.E[f].mean(axis=0)
            lin[i] = self.Wlin[f].sum(axis=0)
        return np.maximum(pooled, 0.0) @ self.W2 + self.b2 + lin

    def __call__(self, text: str) -> list[dict]:
        feats, pieces = featurize_segment(text, self.V)
        if not pieces:
            return []
        logits = self.forward_logits(feats)
        logits -= logits.max(axis=1, keepdims=True)
        probs = np.exp(logits)
        probs /= probs.sum(axis=1, keepdims=True)
        best = probs.argmax(axis=1)
        out = []
        for (ptext, s, e, cont), li, p in zip(pieces, best, probs.max(axis=1)):
            label = self.labels[li]
            if label == "O":
                continue
            word = ("##" + ptext) if cont else ptext
            out.append(
                {"entity": label, "word": word, "start": s, "end": e, "score": float(p)}
            )
        return out


@register_tagger("np-token-classifier")
class NumpyTokenClassifierTagger:
    """A1 with a RUNNABLE checkpoint: same chain as HFTokenClassifierTagger
    (stages/hf_tagger.py) with the numpy model standing where the
    transformers pipeline stands on a real cluster."""

    def __init__(
        self,
        checkpoint_path: str = DEFAULT_CHECKPOINT,
        allowed_types: set[str] | None = None,
    ):
        self.pipe = NumpyTokenClassificationModel(checkpoint_path)
        self.allowed_types = allowed_types

    def tag_segment(self, text: str) -> list[dict]:
        pieces = self.pipe(text)
        spans = bio_merge(pieces)                            # M4
        if self.allowed_types is not None:
            spans = filter_types(spans, self.allowed_types)  # M5
        spans = dedup_spans(spans)                           # M7
        return remove_overlapping(spans)                     # M6

    # identical Arrow batch interface to every other tagger
    __call__ = GazetteerTagger.__call__
