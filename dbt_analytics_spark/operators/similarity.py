"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the scale path (candidates only meet within a hash bucket). Both use
higher-order functions (zip_with/aggregate) so the arithmetic runs JVM-side.

Scale design (100 TB): broadcast the (small) query set against the corpus —
the corpus never shuffles; top-k per query is a partial-aggregate-friendly
window. For corpus×corpus all-pairs, use the LSH variant: the random
hyperplane signatures bucket vectors so each bucket join is tiny.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import fan_out


def _arrow_type_for(spark_simple_type: str):
    """Arrow type matching a Spark simpleString type name, for pinning
    mapInArrow emit schemas. Python-list pa.array inference widens every
    integer to int64 and so crashes on non-bigint id columns (and on
    empty emits, where inference has nothing to go on)."""
    import pyarrow as pa

    mapping = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
    }
    if spark_simple_type not in mapping:
        raise TypeError(
            f"unsupported id column type {spark_simple_type!r}; "
            "expected an integer, float, string, date or timestamp type"
        )
    return mapping[spark_simple_type]


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _pair_cosine() -> Column:
    return dot(F.col("qvec"), F.col("cvec")) / (
        F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2"))
    )


def _seq_dot_matrix(M: "np.ndarray", Q: "np.ndarray") -> "np.ndarray":
    """(n, d) × (d, m) pair dots with the EXACT float semantics of the HOF
    fold ``dot()`` (and DuckDB's ``list_inner_product``): each product
    rounded once, then summed left-to-right over dimensions. Vectorized
    across the (row, query) grid but looped over d, so every output bit
    matches the fold — a BLAS matmul would not (pairwise/FMA summation).
    ~64 fused passes per batch still beat 360k interpreted folds ~10×."""
    import numpy as np

    acc = np.zeros((M.shape[0], Q.shape[1]), dtype=np.float64)
    for d in range(M.shape[1]):
        acc += M[:, d, None] * Q[None, d, :]
    return acc


def _seq_self_dot(M: "np.ndarray") -> "np.ndarray":
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for d in range(M.shape[1]):
        acc += M[:, d] * M[:, d]
    return acc


def _batch_matrix(col: "pa.Array", n: int) -> "np.ndarray":
    """(n, dim) float64 matrix from an Arrow list<float/double> column —
    the fast path reads the SINGLE flat values buffer and reshapes
    (zero-copy until the exact float32→float64 widen), skipping the
    per-row python conversion loop that dominated the old transfer
    (measured at sf10: row-loop ~0.3 s of a 1.9 s query). Sliced arrays
    are honored via the offsets window; ragged rows (unequal lengths —
    not a legal embedding column, but cheap to tolerate) fall back to
    the per-row loop."""
    import numpy as np

    off = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(off)
    if n and (widths == widths[0]).all() and widths[0] > 0:
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat[off[0]:off[-1]].reshape(n, -1).astype(
            np.float64, copy=False
        )
    return np.asarray(
        [np.asarray(v, dtype=np.float64) for v in col.to_pylist()]
    )


def _nearest_cells(pdf_vec_col, C: "np.ndarray"):
    """(cells, d2_chosen, M) — nearest centroid per row of an Arrow batch
    column of vectors. THE single definition of the k-means assignment
    step (expanded squared-L2 + argmin with lowest-index tie-break):
    ``kmeans_fit``'s partials and ``kmeans_assign`` both call it, so the
    fit/assign inertia and tie-break contracts cannot drift apart."""
    import numpy as np

    M = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf_vec_col])
    d2 = (
        (M * M).sum(axis=1, keepdims=True)
        - 2.0 * (M @ C.T)
        + (C * C).sum(axis=1)
    )
    cells = d2.argmin(axis=1)
    return cells, d2[np.arange(len(M)), cells], M


def cosine_cells(Xn: "np.ndarray", Cn: "np.ndarray", n: int) -> "np.ndarray":
    """(rows, n) nearest cell ids under COSINE over row-normalized inputs;
    ties prefer the HIGHER cell id. THE single definition of the IVF cell
    rule: ``ivf_topk``'s corpus/query assignment and the persistent
    ``ivf_insert`` index (plans/materialize.py) both call it, so a stored
    cell can never disagree with the in-plan assignment."""
    import numpy as np

    m = Cn.shape[0]
    sims = Xn @ Cn.T
    pos = np.argsort(-sims[:, ::-1], axis=1, kind="stable")[:, :n]
    return m - 1 - pos


def ivf_cell_udf(centroids: "np.ndarray"):
    """Arrow-batched cell assignment for an embedding column under the
    ``cosine_cells`` rule (centroids ride in the task closure — tiny by
    contract). NULL embeddings map to cell -1, so index tables keep the
    row (it is data) while probes — which only read cells >= 0 — never
    surface it."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        out = np.full(len(vs), -1, dtype=np.int32)
        if mask.any():
            M = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vs[mask]]
            )
            Mn = M / np.maximum(
                np.linalg.norm(M, axis=1, keepdims=True), 1e-300
            )
            out[mask.to_numpy()] = cosine_cells(Mn, Cn, 1)[:, 0]
        return pd.Series(out)

    return assign


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    Spark shape (same contract as ``ivf_topk``): the query set is collected
    (broadcast-sized by contract) and rides to executors in the task
    closure; ONE Arrow ``mapInArrow`` pass scores each corpus batch
    against every query as numpy array math and emits ~k rows per query
    per batch (the batch's top-k by similarity, ties included), so the
    only shuffle is the tiny global top-k merge window keyed on query id
    (high-cardinality, unskewed). The corpus never shuffles — at 100 TB
    the scan parallelizes per split and the merge stays
    ~|queries|·k·n_splits rows.

    Round-11 transfer path (decomposed at sf10, BENCH_NOTES "sim1
    decomposition"): the corpus ships to Python as its STORED float type
    (no JVM-side cast-to-double transform — that HOF pays a per-element
    pass AND doubles the Arrow bytes), lands as one flat Arrow buffer
    reshaped zero-copy to (n, dim), then widens float32→float64
    numpy-side — an EXACT widening, so float semantics stay BIT-IDENTICAL
    to the previous cast-in-JVM + HOF-fold formulation (and to the DuckDB
    oracle): see ``_seq_dot_matrix``. The per-batch cut is a vectorized
    kth-value threshold (no per-query lexsort): it emits every row with
    sim >= the batch's kth-best per query — a tie-closed SUPERSET of the
    batch top-k — and the global merge window orders
    (sim DESC, corpus_id ASC) exactly as before, so the final k rows are
    identical. Guarded by the sim1/dd5 oracle hash checks and
    tests/test_similarity_skew.py. Measured at sf10 (200k×64, 20
    queries): 1.87 s → ~1.0-1.2 s end-to-end (DuckDB 0.63 s).
    """
    import numpy as np
    import pyarrow as pa

    id_type = corpus.schema[id_col].dataType.simpleString()
    # The declared mapInArrow schema uses the id column's ACTUAL Spark
    # type; pa.array(list) inference would always produce int64/str and
    # mismatch any narrower id (int, smallint) — including on empty
    # emits — so every emitted array pins an explicit Arrow type.
    pa_id = _arrow_type_for(id_type)
    # NULL vectors are dropped on both sides (a None element would crash
    # the numpy batch conversion; the old fold plan gave such rows NULL
    # sims that never reached top-k anyway).
    q_rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec"))
        .collect()
    )
    q_ids = [r["query_id"] for r in q_rows]
    Q = (
        np.asarray([list(r["qvec"]) for r in q_rows], dtype=np.float64)
        if q_ids
        else np.zeros((0, 1))
    )
    q_norm = np.sqrt(_seq_self_dot(Q))
    Qt = Q.T.copy()
    qid_arr = np.asarray(q_ids)

    def search(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index("cvec"))
            n = len(col)
            if not n or not len(q_ids):
                continue
            ids = b.column(b.schema.get_field_index("corpus_id")).to_numpy(
                zero_copy_only=False
            )
            M = _batch_matrix(col, n)
            # cosine = dot / (sqrt(q_n2) * sqrt(c_n2)) — same op order as
            # _pair_cosine (mul commutes bit-exactly; sqrt/div are IEEE).
            sims = _seq_dot_matrix(M, Qt) / (
                q_norm[None, :] * np.sqrt(_seq_self_dot(M))[:, None]
            )
            # NaN sims (zero-norm vectors) rank smallest — the Arrow
            # transfer turns them into SQL NULL (from_pandas below) and
            # the global merge's desc sorts NULL LAST, so the per-batch
            # cut must agree or results would depend on which batch the
            # zero-norm row landed in.
            s_m = np.where(np.isnan(sims), -np.inf, sims)
            selfmask = ids[:, None] == qid_arr[None, :]
            np.copyto(s_m, -np.inf, where=selfmask)
            kk = min(k, n)
            thr = -np.partition(-s_m, kk - 1, axis=0)[kk - 1, :]
            emit = (s_m >= thr[None, :]) & ~selfmask
            rr, cc = np.nonzero(emit)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qid_arr[cc].tolist(), type=pa_id),
                    pa.array(ids[rr].tolist(), type=pa_id),
                    # from_pandas: NaN ⇒ null, matching the old pandas
                    # transfer (a raw NaN double would sort FIRST under
                    # Spark's desc and corrupt the merge).
                    pa.array(sims[rr, cc], from_pandas=True, type=pa.float64()),
                ],
                names=["query_id", "corpus_id", "cosine_sim"],
            )

    # No fan_out here: scoring is batch-vectorized, not per-row-heavy, so
    # the scan's natural split partitioning is right at every scale — a
    # 100 TB corpus already has thousands of splits, while forcing a small
    # corpus to defaultParallelism partitions pays ~32 Python-worker
    # round-trips plus a shuffle for work one batch does in milliseconds.
    c = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cvec")
    )
    candidates = c.mapInArrow(
        search, f"query_id {id_type}, corpus_id {id_type}, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("corpus_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def _sample_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> "np.ndarray":
    """Deterministic centroid sample: first n_cells vectors in xxhash64
    order. Hash order is partition-independent, so this tiny collect is
    reproducible and pays no shuffle."""
    import numpy as np

    cent_rows = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
        )
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_cells)
        .select("cvec")
        .collect()
    )
    return np.asarray([list(r["cvec"]) for r in cent_rows], dtype=np.float64)


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple["np.ndarray", list[float]]:
    """Distributed Lloyd's k-means over an embedding column. Returns
    (centroids, per-iteration inertia history).

    Scale shape: the MODEL (n_cells × dim doubles) lives on the driver and
    rides to executors in the task closure; the DATA never shuffles. Each
    iteration is one mapInPandas pass emitting per-batch partial sums
    (cell, count, sum-vector, sse) — O(n_cells) rows per batch — which the
    driver reduces into new centroids. That is the canonical scalable
    k-means: pass count = iterations, shuffle bytes ≈ 0, driver memory =
    model size. Init is the deterministic hash-ordered sample (RNG-free,
    reproducible); empty cells keep their previous centroid.
    """
    import numpy as np

    C = _sample_centroids(corpus, id_col, vec_col, n_cells)
    data = fan_out(corpus.filter(F.col(vec_col).isNotNull())).select(
        as_double_array(vec_col).alias("cvec")
    )
    dim = C.shape[1]
    history: list[float] = []

    for _ in range(max_iter):
        C_closure = C.copy()

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                cells, d2_min, M = _nearest_cells(pdf["cvec"], C_closure)
                sse = d2_min.sum()
                counts = np.bincount(cells, minlength=len(C_closure))
                sums = np.zeros_like(C_closure)
                np.add.at(sums, cells, M)
                yield pd.DataFrame(
                    {
                        "cell": np.arange(len(C_closure), dtype="int32"),
                        "n": counts.astype("int64"),
                        "vsum": list(sums),
                        "sse": [float(sse)] + [0.0] * (len(C_closure) - 1),
                    }
                )

        rows = data.mapInPandas(
            partials, "cell int, n long, vsum array<double>, sse double"
        ).collect()
        counts = np.zeros(len(C), dtype=np.int64)
        sums = np.zeros((len(C), dim), dtype=np.float64)
        inertia = 0.0
        for r in rows:
            counts[r["cell"]] += r["n"]
            sums[r["cell"]] += np.asarray(r["vsum"])
            inertia += r["sse"]
        history.append(float(inertia))
        new_C = np.where(
            (counts > 0)[:, None], sums / np.maximum(counts, 1)[:, None], C
        )
        shift = float(np.abs(new_C - C).max())
        C = new_C
        if shift <= tol:
            break
    return C, history


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    n_cells: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors belong to their
    nearest of ``n_cells`` centroid cells; each query searches only its
    ``n_probe`` closest cells.

    Spark shape: ONE ``mapInPandas`` pass over the corpus does centroid
    assignment, probe-cell masking, scoring, and per-batch top-k as numpy
    matmuls (centroids + the small-by-contract query set ride along in the
    task closure — nothing data-sized shuffles). Each batch emits at most
    k rows per query, so the only shuffle is the tiny global top-k merge.
    Per-batch top-k then global top-k is exact over the probed candidate
    set. At 100 TB the corpus scan parallelizes per split and the merge
    stays ~|queries|·k·n_splits rows.

    Centroids default to a deterministic hash-ordered sample of the corpus
    (RNG-free, reproducible); ``kmeans_iters > 0`` refines them with that
    many distributed Lloyd iterations (see ``kmeans_fit``) before the
    search pass — better-balanced cells at the cost of one corpus pass per
    iteration. ``centroids`` injects a pre-trained model instead
    (``kmeans_fit``'s output, persisted via ``save_centroids`` /
    ``load_centroids``): production deployments fit once and reuse across
    runs, skipping every training pass.
    """
    import numpy as np

    id_type = corpus.schema[id_col].dataType.simpleString()

    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        if C.ndim != 2:
            raise ValueError(f"ivf_topk: centroids must be 2-D, got shape {C.shape}")
    elif kmeans_iters > 0:
        C, _ = kmeans_fit(
            corpus, id_col, vec_col, n_cells=n_cells, max_iter=kmeans_iters
        )
    else:
        C = _sample_centroids(corpus, id_col, vec_col, n_cells)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    m = C.shape[0]

    # Query set: collected to the driver (it is broadcast-sized by contract)
    # and shipped in the task closure as a dense matrix.
    q_rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec"))
        .collect()
    )
    q_ids = [r["query_id"] for r in q_rows]
    Q = np.asarray([list(r["qvec"]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)

    def nearest_cells(Xn: "np.ndarray", n: int) -> "np.ndarray":
        # The shared IVF cell rule (cosine over normalized rows, higher
        # cell id wins ties) — see cosine_cells.
        return cosine_cells(Xn, Cn, n)

    # (n_queries, n_cells) bool: does query j probe cell c?
    probe_mask = np.zeros((len(q_ids), m), dtype=bool)
    if len(q_ids):
        rows = np.repeat(np.arange(len(q_ids)), n_probe)
        probe_mask[rows, nearest_cells(Qn, n_probe).ravel()] = True

    out_schema = (
        f"query_id {id_type}, corpus_id {id_type}, cosine_sim double"
    )

    def search(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["corpus_id"].to_numpy()
            M = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            cells = nearest_cells(Mn, 1)[:, 0]
            sims_all = Mn @ Qn.T  # (batch, n_queries)
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                mask = probe_mask[j][cells]
                mask &= ids != qid
                (idx,) = np.nonzero(mask)
                if not idx.size:
                    continue
                s = sims_all[idx, j]
                # top-k by (sim desc, corpus_id asc); lexsort: last key primary.
                order = np.lexsort((ids[idx], -s))[:k]
                take = idx[order]
                out_q.extend([qid] * len(take))
                out_c.extend(ids[take].tolist())
                out_s.extend(sims_all[take, j].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "corpus_id": out_c, "cosine_sim": out_s}
            )

    # Natural split partitioning (see cosine_topk): the assignment/scoring
    # pass is batch-vectorized, so fan_out would only add a shuffle and
    # Python-worker round-trips at small scale.
    c = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
    )
    candidates = c.mapInPandas(search, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("corpus_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_index_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    n_probe: int = 4,
    cell_col: str = "__ivf_cell",
) -> DataFrame:
    """IVF top-k over a PERSISTENT index: a corpus whose cell assignment
    (``cell_col``, written by the ``ivf_insert`` incremental strategy
    under the same ``cosine_cells`` rule) is stored as a PARTITION
    column. The probe filters to the union of the queries' probe cells
    BEFORE the scan, so partition pruning reads only ~n_probe/n_cells of
    the data — the physical realization of "search only the probed
    cells" that the in-closure masking of :func:`ivf_topk` cannot give.

    Result-identical to ``ivf_topk(corpus, queries, centroids=C,
    n_probe=n_probe)`` on the full corpus: pruning removes exactly the
    rows whose cell no query probes, which the mask would discard anyway
    (pinned by tests/test_ivf_index.py).
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    q_rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(as_double_array(vec_col).alias("qvec"))
        .collect()
    )
    if not q_rows:
        return ivf_topk(
            corpus.limit(0), queries, id_col, vec_col, k=k,
            n_probe=n_probe, centroids=C,
        )
    Q = np.asarray([list(r["qvec"]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    probed = sorted(
        {int(c) for c in cosine_cells(Qn, Cn, min(n_probe, C.shape[0])).ravel()}
    )
    pruned = corpus.filter(F.col(cell_col).isin(probed)).drop(cell_col)
    return ivf_topk(
        pruned, queries, id_col, vec_col, k=k, n_probe=n_probe, centroids=C
    )


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    n_codes: int = 16,
    max_iter: int = 5,
    tol: float = 1e-6,
) -> "np.ndarray":
    """Train product-quantization codebooks: split each (L2-normalized)
    vector into ``n_subspaces`` contiguous subvectors and run k-means with
    ``n_codes`` centroids independently in every subspace. Returns an array
    of shape (n_subspaces, n_codes, dim // n_subspaces).

    Scale shape: ALL subspaces train in the same corpus pass — one
    ``mapInPandas`` per Lloyd iteration emits (subspace, code, count,
    sum-vector) partials (n_subspaces × n_codes skinny rows per batch) and
    the driver reduces them into new codebooks, exactly like
    ``kmeans_fit``. The model is tiny (m·k·d/m doubles = k·d — same size as
    ONE vector row per code) and rides in the task closure; the data never
    shuffles. Init is the deterministic hash-ordered sample, so training is
    RNG-free and reproducible; empty codes keep their previous centroid.
    """
    import numpy as np

    S0 = _sample_centroids(corpus, id_col, vec_col, n_codes)
    dim = S0.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    S0n = S0 / np.maximum(np.linalg.norm(S0, axis=1, keepdims=True), 1e-300)
    B = np.stack(
        [S0n[:, s * sub : (s + 1) * sub] for s in range(n_subspaces)]
    )  # (m, n_codes, sub)

    data = fan_out(corpus.filter(F.col(vec_col).isNotNull())).select(
        as_double_array(vec_col).alias("cvec")
    )

    for _ in range(max_iter):
        B_closure = B.copy()

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                M = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["cvec"]]
                )
                Mn = M / np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-300
                )
                for s in range(n_subspaces):
                    X = Mn[:, s * sub : (s + 1) * sub]
                    Bs = B_closure[s]
                    d2 = (
                        (X * X).sum(axis=1, keepdims=True)
                        - 2.0 * (X @ Bs.T)
                        + (Bs * Bs).sum(axis=1)
                    )
                    codes = d2.argmin(axis=1)
                    counts = np.bincount(codes, minlength=n_codes)
                    sums = np.zeros_like(Bs)
                    np.add.at(sums, codes, X)
                    yield pd.DataFrame(
                        {
                            "sub": np.full(n_codes, s, dtype="int32"),
                            "code": np.arange(n_codes, dtype="int32"),
                            "n": counts.astype("int64"),
                            "vsum": list(sums),
                        }
                    )

        rows = data.mapInPandas(
            partials, "sub int, code int, n long, vsum array<double>"
        ).collect()
        counts = np.zeros((n_subspaces, n_codes), dtype=np.int64)
        sums = np.zeros_like(B)
        for r in rows:
            counts[r["sub"], r["code"]] += r["n"]
            sums[r["sub"], r["code"]] += np.asarray(r["vsum"])
        new_B = np.where(
            (counts > 0)[:, :, None],
            sums / np.maximum(counts, 1)[:, :, None],
            B,
        )
        shift = float(np.abs(new_B - B).max())
        B = new_B
        if shift <= tol:
            break
    return B


def pq_encode(
    corpus: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to its per-subspace nearest-code ids:
    (corpus_id, codes array<smallint>). THIS is the 100 TB artifact — a
    64-dim float32 vector (256 B) becomes 8 codes (8 B with k≤256), a 32×
    compression, so a corpus whose raw embeddings span terabytes scans as
    a few-GB code table. One ``mapInPandas`` pass; codebooks ride in the
    closure; nothing shuffles."""
    import numpy as np

    m, n_codes, sub = codebooks.shape
    id_type = corpus.schema[id_col].dataType.simpleString()

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            codes = np.empty((len(M), m), dtype=np.int16)
            for s in range(m):
                X = Mn[:, s * sub : (s + 1) * sub]
                Bs = codebooks[s]
                d2 = (
                    (X * X).sum(axis=1, keepdims=True)
                    - 2.0 * (X @ Bs.T)
                    + (Bs * Bs).sum(axis=1)
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"corpus_id": pdf["corpus_id"], "codes": list(codes)}
            )

    c = fan_out(corpus.filter(F.col(vec_col).isNotNull())).select(
        F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
    )
    return c.mapInPandas(encode, f"corpus_id {id_type}, codes array<smallint>")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    n_subspaces: int = 8,
    n_codes: int = 16,
    kmeans_iters: int = 5,
    refine: int = 4,
    codebooks: "np.ndarray | None" = None,
) -> DataFrame:
    """Product-quantization approximate top-k with asymmetric distance
    computation (ADC) and exact re-rank.

    ``codebooks`` injects a pre-trained model (shape (m, n_codes, sub) —
    ``pq_fit``'s output): production deployments fit once, persist, and
    reuse across queries/runs rather than re-running Lloyd iterations per
    call. When omitted, ``pq_fit`` trains on the corpus in-pass.

    Per query, a lookup table of subvector·codeword dot products (m ×
    n_codes doubles) is precomputed on the driver; the approximate
    similarity of a corpus vector is then the sum of m table lookups on its
    PQ codes — no float vector math in the scan's inner loop. The top
    ``k·refine`` candidates per batch are re-ranked with their EXACT cosine
    (the raw vectors are in hand inside the batch), so quantization error
    only affects which candidates are considered, never the reported
    similarity values.

    Spark shape mirrors ``ivf_topk``: ONE ``mapInPandas`` corpus pass
    (encode → ADC via fancy indexing → per-batch candidate top-k·refine →
    exact re-rank → top-k), emitting ≤ k rows per query per batch; the only
    shuffle is the tiny global top-k merge window. At 100 TB you'd persist
    ``pq_encode``'s code table once and scan IT instead of the raw vectors
    (re-ranking against a gathered candidate subset); here corpus and codes
    are consumed in the same pass to keep the operator one-shot.
    """
    import numpy as np

    B = (
        codebooks
        if codebooks is not None
        else pq_fit(
            corpus,
            id_col,
            vec_col,
            n_subspaces=n_subspaces,
            n_codes=n_codes,
            max_iter=kmeans_iters,
        )
    )
    m, _, sub = B.shape
    id_type = corpus.schema[id_col].dataType.simpleString()

    q_rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qvec"))
        .collect()
    )
    q_ids = [r["query_id"] for r in q_rows]
    Q = np.asarray([list(r["qvec"]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    # LUT[s]: (n_codes, n_queries) — codeword · query-subvector dot products.
    LUT = np.stack(
        [B[s] @ Qn[:, s * sub : (s + 1) * sub].T for s in range(m)]
    )

    n_cand = max(k * refine, k)

    def search(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["corpus_id"].to_numpy()
            M = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            codes = np.empty((len(M), m), dtype=np.int64)
            for s in range(m):
                X = Mn[:, s * sub : (s + 1) * sub]
                Bs = B[s]
                d2 = (
                    (X * X).sum(axis=1, keepdims=True)
                    - 2.0 * (X @ Bs.T)
                    + (Bs * Bs).sum(axis=1)
                )
                codes[:, s] = d2.argmin(axis=1)
            # ADC: approx sims for every (row, query) via m table lookups.
            approx = np.zeros((len(M), len(q_ids)))
            for s in range(m):
                approx += LUT[s][codes[:, s]]
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                mask = ids != qid
                (idx,) = np.nonzero(mask)
                if not idx.size:
                    continue
                a = approx[idx, j]
                order = np.lexsort((ids[idx], -a))[:n_cand]
                cand = idx[order]
                exact = Mn[cand] @ Qn[j]
                keep = np.lexsort((ids[cand], -exact))[:k]
                take = cand[keep]
                out_q.extend([qid] * len(take))
                out_c.extend(ids[take].tolist())
                out_s.extend((Mn[take] @ Qn[j]).tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "corpus_id": out_c, "cosine_sim": out_s}
            )

    # Natural split partitioning (see cosine_topk): ADC scoring is
    # batch-vectorized; fan_out would only add overhead at small scale.
    c = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("corpus_id"), as_double_array(vec_col).alias("cvec")
    )
    candidates = c.mapInPandas(
        search, f"query_id {id_type}, corpus_id {id_type}, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("corpus_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Model persistence: fit-once / reuse-everywhere lifecycle for the ANN
# models. Both artifacts are driver-sized (KBs) and written as plain
# parquet so any engine — this package, Spark SQL, DuckDB — can read them;
# a 1000-executor job loads the model once on the driver and ships it in
# task closures exactly like the in-pass-fit path.
# ---------------------------------------------------------------------------


def save_codebooks(codebooks: "np.ndarray", path: str) -> None:
    """Persist ``pq_fit`` output (shape (n_subspaces, n_codes, sub)) as a
    skinny parquet table (subspace, code, centroid array<double>)."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)
    if B.ndim != 3:
        raise ValueError(f"save_codebooks: expected 3-D array, got shape {B.shape}")
    m, k, _ = B.shape
    pd.DataFrame(
        {
            "subspace": np.repeat(np.arange(m, dtype=np.int32), k),
            "code": np.tile(np.arange(k, dtype=np.int32), m),
            "centroid": [B[s, c].tolist() for s in range(m) for c in range(k)],
        }
    ).to_parquet(path, index=False)


def load_codebooks(path: str) -> "np.ndarray":
    """Inverse of ``save_codebooks``; returns the dense (m, k, sub) array
    for ``pq_topk(codebooks=...)`` / ``pq_encode``."""
    import numpy as np

    pdf = pd.read_parquet(path).sort_values(["subspace", "code"])
    m = int(pdf["subspace"].max()) + 1
    k = int(pdf["code"].max()) + 1
    if len(pdf) != m * k:
        raise ValueError(
            f"load_codebooks: {path} holds {len(pdf)} rows, expected {m}×{k}"
        )
    flat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["centroid"]])
    return flat.reshape(m, k, flat.shape[1])


def save_centroids(centroids: "np.ndarray", path: str) -> None:
    """Persist ``kmeans_fit`` centroids (shape (n_cells, dim)) as parquet
    (cell, centroid array<double>) for ``ivf_topk(centroids=...)``."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError(f"save_centroids: expected 2-D array, got shape {C.shape}")
    pd.DataFrame(
        {
            "cell": np.arange(len(C), dtype=np.int32),
            "centroid": [row.tolist() for row in C],
        }
    ).to_parquet(path, index=False)


def load_centroids(path: str) -> "np.ndarray":
    """Inverse of ``save_centroids``."""
    import numpy as np

    pdf = pd.read_parquet(path).sort_values("cell")
    return np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["centroid"]])


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a counter-based
    generator (no RNG state; reproducible across runs and engines)."""
    import hashlib
    import struct

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"plane:{plane_idx}:{i}".encode()).digest()
        (u,) = struct.unpack(">Q", h[:8])
        vals.append((u / 2**64) * 2.0 - 1.0)
    return vals


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH, then exact cosine within
    the bucket. Multi-table (`num_tables` independent plane sets): a pair
    collides if ANY table buckets them together — the standard
    recall/candidate-count dial (one table of p planes has collision
    probability (1-θ/π)^p, which is tiny for mid-range angles; OR-ing L
    tables lifts it to 1-(1-p_1)^L).

    Scale: candidates meet only on (table, bucket) join keys —
    ~|corpus|·L/2^p rows per bucket; the pair set is deduped before the
    exact rerank so each candidate is scored once.

    The signature pass is ONE Arrow-batched numpy matmul per side
    ((batch × dim) @ (dim × L·p) → sign bits → per-table codes): the
    planes ride in the task closure (L·p·dim doubles — bytes), the corpus
    never shuffles for bucketing, and the matmul replaces L·p interpreted
    HOF folds per row (measured 8-10× on the sf0.1 suite; same rationale
    as ivf_topk's scoring pass).
    """
    import numpy as np

    # reshape (not bare asarray) so num_planes=0 — the EXACT regime: zero
    # cuts ⇒ one bucket ⇒ brute-force within the same machinery, used by
    # sim2b's oracle check — yields a well-formed (dim, 0) operand.
    planes = (
        np.asarray(
            [
                _hyperplane(dim, t * num_planes + p)
                for t in range(num_tables)
                for p in range(num_planes)
            ],
            dtype=np.float64,
        )
        .reshape(num_tables * num_planes, dim)
        .T
    )  # (dim, tables*planes)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    def bucketize(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            signs = (m @ planes) >= 0  # (n, tables*planes)
            codes = (
                signs.reshape(n, num_tables, num_planes) @ weights
            )  # (n, tables)
            # sequential-fold self-dots (NOT einsum): the rerank divides by
            # these, and the cross-engine float contract (sim1/sim2b) is
            # each product rounded once then summed left-to-right —
            # einsum's pairwise summation differs in the last ulp.
            n2 = _seq_self_dot(m)
            idx = np.repeat(np.arange(n), num_tables)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values[idx],
                    "vec": pdf["vec"].values[idx],
                    "n2": n2[idx],
                    "table": np.tile(np.arange(num_tables), n).astype("int32"),
                    "bucket": codes.reshape(-1).astype("int32"),
                }
            )

    # Preserve the caller's id type (string ids, ints narrower than long)
    # instead of forcing Arrow to coerce to long — same contract as
    # ivf_topk/pq_topk, which derive it from the corpus schema.
    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"id {id_type}, vec array<double>, n2 double, table int, bucket int"
    c = (
        fan_out(corpus.filter(F.col(vec_col).isNotNull()))
        .select(F.col(id_col).alias("id"), as_double_array(vec_col).alias("vec"))
        .mapInPandas(bucketize, schema)
        .select(
            F.col("id").alias("corpus_id"),
            F.col("vec").alias("cvec"),
            F.col("n2").alias("c_n2"),
            "table",
            "bucket",
        )
    )
    q = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"), as_double_array(vec_col).alias("vec"))
        .mapInPandas(bucketize, schema)
        .select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("n2").alias("q_n2"),
            "table",
            "bucket",
        )
    )

    pairs = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("corpus_id") != F.col("query_id"))
        .drop("table", "bucket")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    scored = pairs.select(
        "query_id", "corpus_id", _pair_cosine().alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def kmeans_assign(
    corpus: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (squared L2).
    Returns (id, cell int, dist2 double). NULL embeddings are dropped.

    Scale shape: the model rides in the task closure; ONE ``mapInPandas``
    numpy pass over the corpus, no shuffle at all — the output keeps the
    scan's partitioning. Ties break to the lowest cell index (numpy argmin),
    matching ``kmeans_fit``'s assignment step exactly, so
    sum(dist2) == the fit's final inertia.
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError(f"kmeans_assign: centroids must be 2-D, got shape {C.shape}")
    id_type = corpus.schema[id_col].dataType.simpleString()
    data = fan_out(corpus.filter(F.col(vec_col).isNotNull())).select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("cvec")
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cells, d2_min, _ = _nearest_cells(pdf["cvec"], C)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cell": cells.astype("int32"),
                    "dist2": d2_min,
                }
            )

    return data.mapInPandas(assign, f"id {id_type}, cell int, dist2 double")


def kmeans_cluster_stats(assigned: DataFrame) -> DataFrame:
    """Per-cluster rollup of ``kmeans_assign`` output: size and mean
    squared distance (rounded to 6 decimals — float sum order is
    undefined). One partial-agg groupBy over skinny rows."""
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.avg("dist2"), 6).alias("mean_dist2"),
    )


def semdedup_flags(
    corpus_with_cell: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    threshold: float = 0.4,
    block: int = 1024,
) -> DataFrame:
    """SemDeDup-style cluster-bounded semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): within each embedding cluster, flag every vector
    that has a LOWER-id neighbor with cosine >= ``threshold`` (greedy
    keep-first — the kept set is deterministic and order-free). Returns
    ``(id, cell, n_dups_lower, is_dropped)`` for every input vector.

    Scale design (100 TB): the cluster assignment (``kmeans_assign``)
    bounds the quadratic — pairs are only ever formed INSIDE a cell, so
    the cost is sum(|cell|^2), not |corpus|^2; the cells are the unit of
    parallelism (one ``applyInPandas`` group each). Per-cell memory is
    bounded by ``block``: the sim matrix is computed in row blocks
    (|cell| x block at a time), never materializing |cell|^2 floats. A
    pathological giant cell is the n_cells dial's job (more centroids →
    smaller cells), the same dial IVF uses; the block loop keeps even a
    hot cell from OOMing the executor.

    Exactness: cosine is dot/(||a||*||b||) rounded to 6 decimals BEFORE
    the threshold compare (the sim5b/txt12 convention), so the numpy
    matmul's summation order and an oracle's sequential fold agree.
    """
    import numpy as np

    id_type = corpus_with_cell.schema[id_col].dataType.simpleString()
    data = corpus_with_cell.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(cell_col).cast("int").alias("cell"),
        as_double_array(vec_col).alias("cvec"),
    )

    def flag_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
        n = len(pdf)
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        n_lower = np.zeros(n, dtype=np.int64)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            # rows lo:hi vs ALL columns; only j < i pairs count
            sims = (X[lo:hi] @ X.T) / (norms[lo:hi, None] * norms[None, :])
            hits = np.round(sims, 6) >= threshold
            for r in range(hi - lo):
                i = lo + r
                n_lower[i] = int(hits[r, :i].sum())
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "n_dups_lower": n_lower,
                "is_dropped": n_lower > 0,
            }
        )

    return data.groupBy("cell").applyInPandas(
        flag_cell,
        f"id {id_type}, cell int, n_dups_lower bigint, is_dropped boolean",
    )
