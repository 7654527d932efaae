"""Arrow-vectorized k-word shingle hashing (the dd3 shingle stage).

The expression path (``dedup.shingles_hashed``) builds every k-gram as a
STRING via interpreted higher-order functions — ``transform`` /
``concat_ws`` / ``slice`` are CodegenFallback expressions — and then
hashes it, which measured 15.5 s of the 36.7 s dd3 wall at 500k docs
(BENCH_DD3_DECOMP_r15 ``named_floors``). This module computes the SAME
hashes (bit-identical ``xxhash64(shingle_string)`` values, seed 42)
without ever materializing a shingle string, using the observation that
after whitespace normalization every k-gram "tok_i .. tok_{i+k-1}"
joined by single spaces is a CONTIGUOUS BYTE SLICE of the normalized
text. So per Arrow batch:

1. normalize text in C++ (``pyarrow.compute``: collapse Java-``\\s`` runs
   to one space, trim spaces) — exactly ``trim(regexp_replace(c, "\\s+",
   " "))`` from ``operators.text.tokens``;
2. find token boundaries = space-byte positions in the shared Arrow data
   buffer (UTF-8 multibyte units are all >= 0x80, so scanning for 0x20
   cannot split a code point);
3. derive each window's (start, length) with numpy index arithmetic —
   no per-row Python;
4. hash all windows with a vectorized XXH64 (seed 42) over the shared
   buffer — the implementation below is pinned bit-identical to Spark's
   ``xxhash64`` by ``tests/test_shingle_arrow.py`` across lengths 0-200,
   all tail classes and multibyte UTF-8;
5. per-doc distinct on the hash values (the expression path distincts
   the strings THEN hashes: identical sets unless two distinct shingles
   collide in 64 bits, ~n²/2⁶⁴ per doc ≈ 1e-16 at 125 shingles — the
   same collision tolerance ``shingles_hashed`` already accepts for set
   semantics).

Output rows/values match ``select(doc, shingles_hashed(text, k))`` as
SETS per doc; element ORDER within the array differs (sorted by hash vs
first-occurrence), which no consumer observes — signatures take a min
over the array, the Jaccard verify takes intersection/size. Equality is
pinned set-wise in tests/test_shingle_arrow.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# XXH64 primes (public spec, Yann Collet; same constants as Spark's
# catalyst XXH64).
_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M64 = (1 << 64) - 1

#: Spark's xxhash64 seed.
SPARK_SEED = 42

#: Java Pattern ``\s`` (no UNICODE_CHARACTER_CLASS): space, tab, LF,
#: vertical tab, form feed, CR. RE2 (pyarrow) gets the explicit class so
#: the two engines agree byte-for-byte (RE2's own ``\s`` lacks \x0B).
_JAVA_WS_RE2 = "[ \t\n\x0b\f\r]+"

_SHIFTS = (np.uint64(8) * np.arange(8, dtype=np.uint64)).astype(np.uint64)
_SHIFTS4 = (np.uint64(8) * np.arange(4, dtype=np.uint64)).astype(np.uint64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    return (x << r_) | (x >> np.uint64(64 - r))


def _read_u64(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian u64 gather at arbitrary byte offsets."""
    b = buf[pos[:, None] + np.arange(8)].astype(np.uint64)
    return (b << _SHIFTS).sum(axis=1, dtype=np.uint64)


def _read_u32(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    b = buf[pos[:, None] + np.arange(4)].astype(np.uint64)
    return (b << _SHIFTS4).sum(axis=1, dtype=np.uint64)


def xxh64_windows(
    buf: np.ndarray,
    starts: np.ndarray,
    lens: np.ndarray,
    seed: int = SPARK_SEED,
) -> np.ndarray:
    """Vectorized XXH64 of ``buf[starts[i] : starts[i]+lens[i]]`` for every
    window i. Returns signed int64 (Spark's ``xxhash64`` value).

    Matches Spark's catalyst XXH64 (reference XXH64 with little-endian
    reads) for ALL lengths: >=32-byte inputs run the 4-lane stripe loop
    on the compacted long-window subset (rare for k-word shingles), then
    every window takes the shared 8-byte / 4-byte / byte tail.
    """
    n = starts.shape[0]
    starts = starts.astype(np.int64, copy=False)
    lens = lens.astype(np.int64, copy=False)
    h = np.empty(n, dtype=np.uint64)
    seed_u = np.uint64(seed & _M64)

    long_idx = np.flatnonzero(lens >= 32)
    if long_idx.size:
        s = starts[long_idx]
        nstripes = lens[long_idx] >> 5
        v1 = np.full(long_idx.size, np.uint64((seed + int(_P1) + int(_P2)) & _M64))
        v2 = np.full(long_idx.size, np.uint64((seed + int(_P2)) & _M64))
        v3 = np.full(long_idx.size, np.uint64(seed & _M64))
        v4 = np.full(long_idx.size, np.uint64((seed - int(_P1)) & _M64))
        pos = s.copy()
        for st in range(int(nstripes.max())):
            m = np.flatnonzero(nstripes > st)
            p = pos[m]
            v1[m] = _rotl(v1[m] + _read_u64(buf, p) * _P2, 31) * _P1
            v2[m] = _rotl(v2[m] + _read_u64(buf, p + 8) * _P2, 31) * _P1
            v3[m] = _rotl(v3[m] + _read_u64(buf, p + 16) * _P2, 31) * _P1
            v4[m] = _rotl(v4[m] + _read_u64(buf, p + 24) * _P2, 31) * _P1
            pos[m] += 32
        hl = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            hl = (hl ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
        h[long_idx] = hl
        consumed = np.zeros(n, dtype=np.int64)
        consumed[long_idx] = nstripes << 5
    else:
        consumed = np.zeros(n, dtype=np.int64)
    short_mask = lens < 32
    h[short_mask] = seed_u + _P5
    h += lens.astype(np.uint64)

    pos = starts + consumed
    rem = lens - consumed  # 0..31
    nwords = rem >> 3  # 0..3
    for w in range(3):
        idx = np.flatnonzero(nwords > w)
        if idx.size == 0:
            break
        k1 = _rotl(_read_u64(buf, pos[idx]) * _P2, 31) * _P1
        hi = h[idx] ^ k1
        h[idx] = _rotl(hi, 27) * _P1 + _P4
        pos[idx] += 8
    rem = rem - (nwords << 3)  # 0..7
    idx = np.flatnonzero(rem >= 4)
    if idx.size:
        hi = h[idx] ^ (_read_u32(buf, pos[idx]) * _P1)
        h[idx] = _rotl(hi, 23) * _P2 + _P3
        pos[idx] += 4
        rem[idx] -= 4
    for b in range(3):  # rem now 0..3
        idx = np.flatnonzero(rem > b)
        if idx.size == 0:
            break
        byte = buf[pos[idx] + b].astype(np.uint64)
        hi = h[idx] ^ (byte * _P5)
        h[idx] = _rotl(hi, 11) * _P1
    # avalanche
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h.view(np.int64)


def _shingle_hash_arrays(
    norm_arr, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """From a normalized Arrow string array, per-doc DISTINCT k-gram
    hashes. Returns (list_offsets int64[len+1], values int64)."""
    import pyarrow as pa  # noqa: F401  (worker-side import)

    ndocs = len(norm_arr)
    if ndocs == 0:
        return np.zeros(1, np.int64), np.empty(0, np.int64)
    bufs = norm_arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        norm_arr.offset : norm_arr.offset + ndocs + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    doc_starts = offsets[:-1].copy()
    doc_ends = offsets[1:].copy()
    if norm_arr.null_count:
        null_mask = np.asarray(norm_arr.is_null())
        doc_ends = np.where(null_mask, doc_starts, doc_ends)

    lo, hi = int(offsets[0]), int(offsets[-1])
    space_pos = lo + np.flatnonzero(data[lo:hi] == 32).astype(np.int64)
    space_doc = np.searchsorted(doc_starts, space_pos, side="right") - 1
    # spaces in a null row's (empty) range cannot exist; spaces between a
    # doc's start and end belong to it because normalized arrays are
    # densely packed ascending (pyarrow compute output) — asserted:
    assert bool(np.all(offsets[1:] >= offsets[:-1])), "non-monotonic offsets"

    m = np.bincount(space_doc, minlength=ndocs).astype(np.int64) + 1
    total_tokens = int(m.sum())
    tok_base = np.zeros(ndocs, np.int64)
    np.cumsum(m[:-1], out=tok_base[1:])
    token_starts = np.empty(total_tokens, np.int64)
    token_ends = np.empty(total_tokens, np.int64)
    isfirst = np.zeros(total_tokens, bool)
    isfirst[tok_base] = True
    token_starts[tok_base] = doc_starts
    token_starts[~isfirst] = space_pos + 1
    islast = np.zeros(total_tokens, bool)
    last_idx = tok_base + m - 1
    islast[last_idx] = True
    token_ends[last_idx] = doc_ends
    token_ends[~islast] = space_pos

    n_win = np.where(m >= k, m - k + 1, 1)
    total_win = int(n_win.sum())
    win_base = np.zeros(ndocs, np.int64)
    np.cumsum(n_win[:-1], out=win_base[1:])
    wdoc = np.repeat(np.arange(ndocs, dtype=np.int64), n_win)
    wi = np.arange(total_win, dtype=np.int64) - np.repeat(win_base, n_win)
    tok_idx = tok_base[wdoc] + wi
    end_tok = np.minimum(tok_idx + (k - 1), last_idx[wdoc])
    wstart = token_starts[tok_idx]
    wlen = token_ends[end_tok] - wstart

    hashes = xxh64_windows(data, wstart, wlen)

    # per-doc distinct (wdoc is already doc-ordered; sort hashes within)
    order = np.lexsort((hashes, wdoc))
    hs = hashes[order]
    wd = wdoc[order]
    keep = np.ones(total_win, bool)
    keep[1:] = (wd[1:] != wd[:-1]) | (hs[1:] != hs[:-1])
    out_vals = hs[keep]
    counts = np.bincount(wd[keep], minlength=ndocs)
    list_offsets = np.zeros(ndocs + 1, np.int64)
    np.cumsum(counts, out=list_offsets[1:])
    return list_offsets, out_vals


def shingles_hashed_arrow(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc, sh array<long>) with sh = the DISTINCT xxhash64'd k-word
    shingles of ``text_col`` — the Arrow-vectorized equivalent of
    ``select(id.alias("doc"), shingles_hashed(text, k).alias("sh"))``.

    One ``mapInArrow`` pass; only (id, text) cross the Python boundary
    (guide §4: explicit select before an opaque op preserves column
    pruning at the scan).
    """
    id_field = df.schema[id_col]
    id_ddl = id_field.dataType.simpleString()
    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))

    def _batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            doc_col = batch.column(0)
            text = batch.column(1)
            norm = pc.utf8_trim(
                pc.replace_substring_regex(
                    text, pattern=_JAVA_WS_RE2, replacement=" "
                ),
                characters=" ",
            )
            if isinstance(norm, pa.ChunkedArray):
                norm = norm.combine_chunks()
            list_offsets, vals = _shingle_hash_arrays(norm, k)
            sh = pa.LargeListArray.from_arrays(
                pa.array(list_offsets, pa.int64()),
                pa.array(vals, pa.int64()),
            ).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [doc_col, sh], ["doc", "sh"]
            )

    return src.mapInArrow(_batches, f"doc {id_ddl}, sh array<bigint>")
