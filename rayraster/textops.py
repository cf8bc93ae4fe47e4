"""Text analysis operators: token counts, quality scoring, language
ID, fingerprinting — the per-document metrics a training-data pipeline
computes before filtering (task-brief extension; no reference analog).

All stages are stateless map_batches over Arrow batches; the regex
work uses pyarrow.compute's RE2 kernels (vectorized, C++).  Formulas
that feed SQL-parity queries keep the exact op order of their DuckDB
twins in __ray_entry__.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = r"\s+"


def token_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """token_count (\\S+ runs), char_count, digit/punct/upper counts,
    ws-token mean length — all vectorized RE2 counts.

    SQL twins use duckdb ``regexp_extract_all`` lengths with the same
    patterns (RE2 on both sides ⇒ identical counts)."""
    t = batch[text_col]
    n_chars = pc.utf8_length(t).cast(pa.int64())
    tokens = pc.count_substring_regex(t, r"\S+").cast(pa.int64())
    digits = pc.count_substring_regex(t, r"[0-9]").cast(pa.int64())
    punct = pc.count_substring_regex(t, r"[.,;:!?]").cast(pa.int64())
    upper = pc.count_substring_regex(t, r"[A-Z]").cast(pa.int64())
    batch = batch.append_column("n_chars_m", n_chars)
    batch = batch.append_column("token_count", tokens)
    batch = batch.append_column("digit_count", digits)
    batch = batch.append_column("punct_count", punct)
    batch = batch.append_column("upper_count", upper)
    return batch


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic quality score in [0, 1] from exact integer counts.

    score = 0.4·min(1, tokens/100) + 0.3·(1 − min(1, digit_ratio·5))
          + 0.3·(1 − min(1, punct_ratio·10)),  ratios over max(chars,1)

    Every operand derives from int counts, so the one float expression
    is bit-reproducible by the SQL twin."""
    b = token_metrics(batch, text_col)
    chars = b["n_chars_m"].to_numpy(zero_copy_only=False).astype(np.float64)
    toks = b["token_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    digs = b["digit_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    pun = b["punct_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    denom = np.maximum(chars, 1.0)
    score = (
        0.4 * np.minimum(1.0, toks / 100.0)
        + 0.3 * (1.0 - np.minimum(1.0, digs / denom * 5.0))
        + 0.3 * (1.0 - np.minimum(1.0, pun / denom * 10.0))
    )
    return b.append_column("quality", pa.array(score))


# ---------------------------------------------------------------------------
# language ID — character-frequency heuristic (pure-python-free scoring)
# ---------------------------------------------------------------------------

# tiny per-language stopword profiles (top function words); heuristic
# n-gram/stopword scoring per the task brief — not a trained model.
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"},
    "es": {"el", "la", "de", "que", "los", "las", "es", "un", "una", "por"},
    "zh": set(),  # CJK handled by the script-range rule below
}


class LangIdStage:
    """map_batches actor: stopword-vote + script-range language guess.

    Stateful: profiles → hash sets built once per actor.  Emits
    ``lang_pred`` and ``lang_conf`` (vote share)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: frozenset(v) for k, v in _PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for s in batch[self.text_col].to_pylist():
            # CJK script range → zh (deterministic unicode rule)
            cjk = sum(1 for ch in s[:400] if "一" <= ch <= "鿿")
            if cjk > 5:
                preds.append("zh")
                confs.append(1.0)
                continue
            words = s.lower().split()[:300]
            if not words:
                preds.append("und")
                confs.append(0.0)
                continue
            best, best_v = "und", 0
            for lang, prof in self.profiles.items():
                v = sum(1 for w in words if w in prof)
                if v > best_v:
                    best, best_v = lang, v
            preds.append(best)
            confs.append(best_v / len(words))
        batch = batch.append_column("lang_pred", pa.array(preds, type=pa.string()))
        return batch.append_column("lang_conf", pa.array(confs, type=pa.float64()))


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def json_extract_int(batch: pa.Table, json_col: str, key: str, out_col: str) -> pa.Table:
    """Extract an integer field from a JSON string column (stdlib
    json per row — no JSON kernel in pyarrow 16; rows that lack the
    key or fail to parse yield null)."""
    import json as _json

    out = []
    for s in batch[json_col].to_pylist():
        try:
            v = _json.loads(s).get(key)
            out.append(int(v) if v is not None else None)
        except (ValueError, TypeError, AttributeError):
            out.append(None)
    return batch.append_column(out_col, pa.array(out, type=pa.int64()))


def fingerprint_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Hex md5 per document — SQL twin: duckdb ``md5(text)``."""
    fp = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in batch[text_col].to_pylist()]
    return batch.append_column("fingerprint", pa.array(fp, type=pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 64) -> pa.Table:
    """winnowing-style fingerprint: min rolling-64-byte polynomial hash
    (cheap near-dup prefilter; rows-only — not SQL-expressible)."""
    from rayraster.dedup import char_shingle_hashes

    out = np.empty(batch.num_rows, dtype=np.int64)
    for i, s in enumerate(batch[text_col].to_pylist()):
        h = char_shingle_hashes(s, k=min(window, max(1, len(s))))
        out[i] = np.int64(h.min().astype(np.int64)) if len(h) else 0
    return batch.append_column("rfp", pa.array(out))
