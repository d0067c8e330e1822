"""Near-duplicate detection: MinHash + LSH banding over word shingles.

Pipeline (classic Broder minhash, banded LSH candidate generation):

  norm text → word 3-shingles (distinct) → 12 minhashes
  (md5("i:"+shingle), lexicographic min — md5 is identical in Spark and
  DuckDB, which is what makes the whole pipeline oracle-checkable) →
  6 bands × 2 rows → band key md5 → self equi-join on band key →
  exact-Jaccard verification of candidates → pairs with jaccard ≥ τ.

Scale design — the entire point of LSH:
  * NO all-pairs comparison anywhere: candidates come from an equi-join
    on band_key (hash join; a pytest asserts the physical plan contains
    no CartesianProduct/BroadcastNestedLoop).
  * Work per doc is O(shingles × hashes) in a narrow whole-stage-
    codegen projection over the exploded shingles with map-side-combined
    partial minima (no UDF, no interpreted array lambdas in the hot
    path); the only shuffles are the signature groupBy, the band join,
    and the two shingle-set lookups for verification.
  * Band-key groups can skew on boilerplate-heavy corpora (the classic
    LSH hot-bucket problem): AQE skew-join splitting is on in the engine
    session; a production deployment would additionally cap bucket size
    (drop buckets > N docs, they are near-certain template clusters).
  * b=6 bands × r=2 rows: detection probability 1-(1-j²)⁶ — ≈0.96 at
    j=0.6, ≈0.82 at j=0.5, <0.2 below j=0.25 — tuned to the τ=0.5
    verification threshold.

Banding misses are *identical* on both engines (same md5 values), so
the DuckDB oracle hash-matches exactly despite LSH being probabilistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sql_utils import floor_log2_case_sql

NUM_HASHES = 12
BANDS = 6
ROWS_PER_BAND = 2
SHINGLE_WORDS = 3
DEFAULT_TAU = 0.5


def word_shingles(tokens: Column, norm: Column) -> Column:
    """Distinct word 3-shingles; docs shorter than one shingle fall back
    to their whole normalized text as a single shingle."""
    idx = F.sequence(F.lit(0), F.size(tokens) - SHINGLE_WORDS)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.get(tokens, i), F.get(tokens, i + 1), F.get(tokens, i + 2)
        ),
    )
    return F.array_distinct(
        F.when(F.size(tokens) < SHINGLE_WORDS, F.array(norm)).otherwise(grams)
    )


def _tokens_projection(
    docs: DataFrame, id_col: str = "doc_id", norm_col: str = "norm"
) -> DataFrame:
    """(doc_id, __norm, __tokens) — the token array materialized as a
    real column BEFORE any shingle lambda touches it. Inlining
    ``split(norm)`` straight into the transform() lambda makes
    interpreted evaluation re-run the split (and anything under it,
    e.g. the normalizing regexp) for every array element; a column
    alias referenced more than once is never collapsed into the
    consumer by Catalyst, so this shape computes tokens once per row."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(norm_col).alias("__norm"),
        F.split(F.col(norm_col), " ").alias("__tokens"),
    )


def shingle_docs(
    docs: DataFrame, id_col: str = "doc_id", norm_col: str = "norm"
) -> DataFrame:
    """(doc_id, sh) — the shingle ARRAY per doc. Use this only when the
    array itself is consumed (e.g. persisted for minhash signatures /
    Jaccard verification). Do NOT ``explode`` its output: exploding an
    ALIASED array makes InferFiltersFromGenerate add a
    ``size(sh) > 0 AND isnotnull(sh)`` filter whose expression, after
    projection collapse, is the ENTIRE shingle computation — Catalyst
    then pushes that filter below the repartition onto the
    (single-split) scan, serializing a quadratic re-evaluation onto one
    task (measured 40×). Explode consumers use
    :func:`exploded_shingles`, which keeps the generator input a
    complex inline expression — the infer rule skips those."""
    return _tokens_projection(docs, id_col, norm_col).select(
        "doc_id",
        word_shingles(F.col("__tokens"), F.col("__norm")).alias("sh"),
    )


def exploded_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    out: str = "shingle",
) -> DataFrame:
    """(doc_id, <out>) — one row per distinct word 3-shingle. The
    generator input stays an inline expression over materialized
    token/norm columns: see :func:`shingle_docs` for why both halves of
    that shape are load-bearing."""
    return _tokens_projection(docs, id_col, norm_col).select(
        "doc_id",
        F.explode(word_shingles(F.col("__tokens"), F.col("__norm"))).alias(out),
    )


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def _seeded_hash(i: int):
    """Unary lambda factory — MUST stay single-argument: a two-arg lambda
    would make F.transform pass the array index as the second parameter,
    silently replacing the hash seed."""
    return lambda s: _md5(F.concat(F.lit(f"{i}:"), s))


def minhash_signature(shingles: Column) -> list[Column]:
    """NUM_HASHES lexicographic-min md5 values, seeded by prefix 'i:'.

    Array-lambda form — interpreted (HOFs never whole-stage-codegen).
    The hot pipeline uses :func:`minhash_signatures_agg` instead; this
    form remains for composing over an in-hand shingle array column.
    """
    return [
        F.array_min(F.transform(shingles, _seeded_hash(i))) for i in range(NUM_HASHES)
    ]


def minhash_signatures_agg(exploded: DataFrame) -> DataFrame:
    """(doc_id, h0..h{NUM_HASHES-1}) from an exploded (doc_id, shingle)
    table: NUM_HASHES md5 columns in one flat projection, then
    ``groupBy(doc_id).agg(min, ...)``.

    Same values as :func:`minhash_signature`, radically better
    execution: the projection and partial mins stay inside whole-stage
    codegen (the transform()-lambda form drops the whole stage to the
    interpreted path — measured several× slower, worst on the first,
    JIT-cold run), and the partial mins combine map-side so the shuffle
    carries NUM_HASHES values per doc per mapper, not per shingle."""
    hashed = exploded.select(
        "doc_id",
        *[
            _md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))).alias(f"h{i}")
            for i in range(NUM_HASHES)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(NUM_HASHES)]
    )


def band_keys(sig: list[Column]) -> Column:
    """BANDS keys: md5('b|' + sig slice joined by '|')."""
    keys = []
    for b in range(BANDS):
        parts: list[Column] = [F.lit(f"{b}")]
        for r in range(ROWS_PER_BAND):
            parts += [F.lit("|"), sig[b * ROWS_PER_BAND + r]]
        keys.append(_md5(F.concat(*parts)))
    return F.array(*keys)


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    tau: float = DEFAULT_TAU,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with exact shingle-set Jaccard
    ≥ tau among LSH band-collision candidates. ``norm_col`` must hold
    pre-normalized text. ``shingled`` (optional) is a caller-owned,
    already-persisted (doc_id, sh) frame from :func:`shingle_docs`
    over spread input — composed entries that run several detectors on
    ONE corpus (docs_dedup_ablation) pass it so the corpus is
    tokenized and shingled once, not once per family (r13)."""
    if shingled is None:
        # Spread the input BEFORE the heavy projections: shingling runs
        # through an interpreted higher-order function (array lambdas
        # are not whole-stage-codegen'd), so a single-split input
        # serializes it onto one core. On a real cluster the input
        # arrives in many splits and this exchange is a cheap rebalance
        # of (id, text) rows.
        docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        shingled = shingle_docs(
            docs, id_col, norm_col
        ).persist()  # feeds both verification sides
    # Signature via the codegen explode+agg path (see
    # minhash_signatures_agg): identical values to the array-lambda
    # form, no interpreted stage in the hot path. Exploding the CACHED
    # shingle arrays is safe from the InferFiltersFromGenerate trap
    # (shingle_docs docstring): the inferred size()>0 filter lands on
    # the in-memory relation, not on a recomputation.
    sig_df = minhash_signatures_agg(
        shingled.select("doc_id", F.explode("sh").alias("shingle"))
    )
    sig = [F.col(f"h{i}") for i in range(NUM_HASHES)]
    # persisted: the self-join below consumes `banded` twice; without a
    # cache each side would recompute the whole signature pipeline
    banded = sig_df.select(
        "doc_id", F.explode(band_keys(sig)).alias("band_key")
    ).persist()
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on="band_key")  # equi-join: never a cartesian product
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= tau)


def minhash_estimate_pairs(
    docs: DataFrame, id_col: str = "doc_id", norm_col: str = "norm"
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard, jaccard, abs_err) over EVERY
    band-collision candidate (no tau cut): the minhash ESTIMATE
    (fraction of the NUM_HASHES signature slots that agree — the
    textbook unbiased Jaccard estimator) next to the exact shingle-set
    Jaccard, plus their absolute gap. This is the estimator's measured
    accuracy as a first-class frame (the emb_knn_recall discipline):
    production pipelines that skip exact verification at 100 TB rely
    on exactly this estimate, so its error belongs in a query, not a
    docstring. Same spine as :func:`minhash_near_dup_pairs`; the only
    additions are the two signature re-joins (NUM_HASHES values per
    doc — far smaller than the shingle arrays the verify join already
    carries)."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    shingled = shingle_docs(docs, id_col, norm_col).persist()
    sig_df = minhash_signatures_agg(
        shingled.select("doc_id", F.explode("sh").alias("shingle"))
    ).persist()  # consumed by banding AND both estimate sides
    sig = [F.col(f"h{i}") for i in range(NUM_HASHES)]
    banded = sig_df.select("doc_id", F.explode(band_keys(sig)).alias("band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on="band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    siga = sig_df.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)]
    )
    sigb = sig_df.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)]
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(NUM_HASHES)
    )
    sa = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    est6 = F.round(matches / F.lit(float(NUM_HASHES)), 6)
    j6 = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        6,
    )
    return (
        cand.join(siga, on="doc_a")
        .join(sigb, on="doc_b")
        .join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            est6.alias("est_jaccard"),
            j6.alias("jaccard"),
            F.round(F.abs(est6 - j6), 6).alias("abs_err"),
        )
    )


def minhash_estimate_oracle_sql(parquet_path: str, norm_sql: str) -> str:
    """DuckDB mirror of :func:`minhash_estimate_pairs` — generated from
    the same NUM_HASHES/BANDS constants so the layouts can't drift."""
    sigs = ",\n             ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s))) AS s{i}"
        for i in range(NUM_HASHES)
    )
    keys = ", ".join(
        "md5('{b}|' || {cols})".format(
            b=b,
            cols=" || '|' || ".join(
                f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    match_sum = " + ".join(
        f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
    )
    return f"""
    WITH src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM toks),
    sigs AS (SELECT doc_id, sh,
             {sigs}
      FROM shingled),
    bands AS (SELECT doc_id, unnest([{keys}]) AS band_key FROM sigs),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    scored AS (SELECT c.doc_a, c.doc_b,
        round(({match_sum}) / {NUM_HASHES}.0, 6) AS est_jaccard,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      FROM cand c
      JOIN sigs a ON a.doc_id = c.doc_a
      JOIN sigs b ON b.doc_id = c.doc_b)
    SELECT doc_a, doc_b, est_jaccard, jaccard,
           round(abs(est_jaccard - jaccard), 6) AS abs_err
    FROM scored"""


# --------------------------------------------------------------------------
# Exact n-gram Jaccard via an inverted shingle index (no sketching)
# --------------------------------------------------------------------------

#: Postings cap: shingles appearing in more documents than this are
#: dropped from the index before the pair join. A shingle with document
#: frequency d contributes d^2/2 candidate pairs — without a cap one
#: boilerplate phrase ("all rights reserved") makes the join quadratic
#: in corpus size. 500 is far above any fixture DF (max ~60 at sf0.1)
#: so local results are unaffected, while at 100 TB it bounds the
#: worst postings list. Dropped shingles shrink both docs' kept-sets
#: identically on both engines, so oracle parity holds.
NGRAM_MAX_DF = 500


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    tau: float = DEFAULT_TAU,
    max_df: int = NGRAM_MAX_DF,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with EXACT word-3-gram Jaccard
    ≥ tau, computed over an inverted shingle index — the non-sketch
    counterpart to :func:`minhash_near_dup_pairs` (recall 1.0 for any
    pair sharing at least one sub-cap shingle, vs the banding miss
    probability of LSH).

    Scale design: candidates come from the postings self-join on the
    shingle — never all-pairs — and the intersection size falls out of
    the SAME join (count of shared shingles per pair), so the shingle
    arrays are never re-joined for verification. The window that
    computes document frequency partitions by shingle, and Catalyst
    reuses that partitioning for the self-join — one logical shuffle
    for cap + candidates + intersection.
    """
    from pyspark.sql import Window

    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    posting = exploded_shingles(docs, id_col, norm_col)
    kept = (
        posting.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= max_df)
        .drop("df")
        .persist()  # feeds the size aggregate AND both join sides
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = kept.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


def ngram_jaccard_oracle_sql(
    parquet_path: str,
    norm_sql: str,
    tau: float = DEFAULT_TAU,
    max_df: int = NGRAM_MAX_DF,
) -> str:
    """DuckDB mirror of :func:`ngram_jaccard_pairs` — same shingling
    CTE shape as the minhash oracle, same DF cap constant."""
    return f"""
    WITH src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM toks),
    posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    kept AS (SELECT doc_id, shingle FROM posting
             QUALIFY count(*) OVER (PARTITION BY shingle) <= {max_df}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM kept a JOIN kept b USING (shingle)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = shared.doc_a
    JOIN sizes sb ON sb.doc_id = shared.doc_b
    WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= {tau}"""


# --------------------------------------------------------------------------
# SimHash: 60-bit token-set fingerprint, banded hamming-distance dedup
# --------------------------------------------------------------------------
#
# bit_j(doc) = sign of Σ_tokens (±1 depending on bit j of the token's
# 60-bit md5-derived hash). Banding: 4 × 15-bit chunks — by pigeonhole,
# any pair with hamming distance ≤ 3 shares at least one intact band, so
# the candidate equi-join on (band_index, band_value) is recall-complete
# up to distance 3 (and opportunistic beyond). All integer/bit
# arithmetic — identical in Spark and DuckDB, so oracle-checkable.

SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
# Near-dup verify threshold: unrelated shingle sets land at hamming
# ~30/60 (independent fingerprints), light edits at ~5-20, so 15
# separates cleanly. Band recall is pigeonhole-COMPLETE only to 3;
# beyond that a pair is found iff one 15-bit band survives intact —
# identical on both engines, so parity is unaffected.
DEFAULT_MAX_HAMMING = 15

#: 60-bit token hash from the first 15 md5 hex chars (fits signed int64).
_TOKEN_HASH_SPARK = "CAST(conv(substr(md5(encode(token, 'UTF-8')), 1, 15), 16, 10) AS BIGINT)"
_TOKEN_HASH_DUCK = "CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)"


def _simhash_value_sql(engine: str) -> str:
    """Σ_j 2^j · [Σ_tokens(±1 by bit j) > 0] as one generated expression
    over an exploded (doc_id, h) table — identical text for both engines
    apart from nothing (pure arithmetic)."""
    terms = [
        f"(CASE WHEN sum(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    ]
    return " + ".join(terms)


def simhash_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, simhash bigint) per document over distinct word
    3-shingles. Shingles, not bare tokens: over a small vocabulary the
    token SET barely distinguishes documents (every doc contains most
    words), while the shingle space is combinatorially larger — the
    fingerprint then reflects local word order, like the minhash twin.
    ``shingled`` (optional): a caller-owned persisted (doc_id, sh)
    frame — exploding a CACHED array is safe from the
    InferFiltersFromGenerate trap (see :func:`shingle_docs`), and the
    values are identical to the inline explode."""
    if shingled is not None:
        exploded = shingled.select(
            "doc_id", F.explode("sh").alias("token")
        ).select("doc_id", F.expr(_TOKEN_HASH_SPARK).alias("h"))
    else:
        docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        exploded = exploded_shingles(docs, id_col, norm_col, out="token").select(
            "doc_id", F.expr(_TOKEN_HASH_SPARK).alias("h")
        )
    return exploded.groupBy("doc_id").agg(
        F.expr(_simhash_value_sql("spark")).alias("simhash")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    max_hamming: int = DEFAULT_MAX_HAMMING,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs within ``max_hamming`` bits that
    collide in ≥1 of the 4 bands (recall-complete ≤ 3 by pigeonhole).
    Candidate generation is an equi-join on (band index, band bits) —
    never all-pairs."""
    sims = simhash_docs(docs, id_col, norm_col, shingled=shingled).persist()
    bands = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"(simhash >> {b * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1}"
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band_idx", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("sim_a ^ sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_oracle_sql(
    parquet_path: str, norm_sql: str, max_hamming: int = DEFAULT_MAX_HAMMING
) -> str:
    """DuckDB mirror of :func:`simhash_near_dup_pairs` (same constants)."""
    band_exprs = ", ".join(
        f"(simhash >> {b * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1}"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
    WITH src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    t AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM t),
    toks AS (SELECT doc_id, unnest(sh) AS token FROM shingled),
    hashed AS (SELECT doc_id, {_TOKEN_HASH_DUCK} AS h FROM toks),
    sims AS (SELECT doc_id, {_simhash_value_sql("duck")} AS simhash
             FROM hashed GROUP BY doc_id),
    bands AS (SELECT doc_id, simhash,
                     unnest([{band_exprs}]) AS band_val,
                     unnest(range({SIMHASH_BANDS})) AS band_idx
              FROM sims),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sim_a, b.simhash AS sim_b
             FROM bands a JOIN bands b USING (band_idx, band_val)
             WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}"""


# --------------------------------------------------------------------------
# Embedding-cosine near-dup: sign-bucket LSH + exact cosine verify
# --------------------------------------------------------------------------

#: OR-amplified sign LSH: EMB_BANDS disjoint blocks of EMB_BAND_BITS
#: leading coordinates each; vectors are candidates if ANY band's sign
#: pattern matches. 3x14 measured on the planted fixtures: near-copy
#: recall 0.95-0.96 (vs 0.82 for a single 8-bit bucket) with ~20x
#: fewer candidate pairs at sf0.1 (3*N^2/2^14 vs N^2/2^8).
EMB_BANDS = 3
EMB_BAND_BITS = 14
DEFAULT_COSINE_TAU = 0.99


def _emb_band_keys(
    vec_col: str, bands: int = EMB_BANDS, bits: int = EMB_BAND_BITS
) -> list:
    """Band keys: key_j = (j << bits) | sign-bits of block j — the
    (j <<) namespace keeps bands from colliding with each other, so
    one equi-join column carries all bands. Defaults are the near-dup
    banding (3x14: high precision, recall only at cosine ~0.99);
    callers tune (bands, bits) to their cosine regime — KNN over
    mid-cosine neighbors needs many short bands instead."""
    keys = []
    for j in range(bands):
        key = F.lit(j << bits)
        for i in range(bits):
            key = key + F.when(
                F.get(F.col(vec_col), j * bits + i) > 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        keys.append(key)
    return keys


#: hot-bucket cap for the CAPPED near-dup variant: dropping band
#: buckets with more than this many members bounds the candidate join
#: at cap * n per band — a PROVABLE linear bound (sum of occ^2 with
#: occ <= cap is <= cap * n). 64 is a no-op at oracle scale (mean
#: occupancy ~0.3 at sf0.01). NOTE the measured division of labor at
#: sf1 (550k vectors): occupancy there is UNIFORM (~37.6 mean, max
#: 69), so the cap prunes almost nothing — the cap is the defense
#: against SKEWED template clusters (the synthetic hot-bucket pytest
#: proves it); uniform densification needs the GEOMETRY knob instead
#: (EMB_BAND_BITS_WIDE below: more sign bits per band shrink
#: occupancy multiplicatively).
EMB_BUCKET_CAP = 64

#: scale-geometry banding: 18 sign bits per band instead of 14 — 16x
#: more buckets per band, so bucket occupancy (and with it the
#: candidate join) shrinks ~16x at fixed corpus size. The recall
#: price is analytic and deterministic: P(band match) for a
#: cosine-0.99 pair is (1 - acos(.99)/pi)^bits = 0.955^18 = 0.44/band
#: vs 0.53 at 14 bits (OR over 3 bands: 0.82 vs 0.89) — identical
#: misses on both engines, so parity holds at any geometry.
EMB_BAND_BITS_WIDE = 18

#: AUTO band geometry (VERDICT r9 task #2): the default near-dup entry
#: derives its band bits from the CORPUS COUNT instead of a constant,
#: holding expected bucket occupancy n / 2^bits at ~AUTO_TARGET_OCC —
#: the rule PERF.md stated and the wide twin proved (47 s -> 16 s at
#: sf1 by hand; auto picks the same 18 bits there). bits = smallest
#: b in [14, 21] with TARGET_OCC * 2^b >= n — integer comparisons
#: only, so the Spark plan and the DuckDB oracle (which computes the
#: same count in SQL) can never round differently. The 21-bit ceiling
#: is the coordinate budget (3 bands x 21 signs = 63 <= dim 64);
#: beyond ~6M vectors the next knob is random-projection hyperplanes
#: instead of coordinate signs (documented, not needed at any shipped
#: scale). Band keys namespace at << 22 so bands stay disjoint at any
#: geometry.
AUTO_BITS_MIN = 14
AUTO_BITS_MAX = 21
AUTO_TARGET_OCC = 3
AUTO_BAND_SHIFT = 22


def auto_band_bits(n: int) -> int:
    """The shared geometry rule, driver-side form (used by tests and
    docs; the plan computes the identical CASE chain JVM-side)."""
    bits = AUTO_BITS_MIN
    while bits < AUTO_BITS_MAX and n > AUTO_TARGET_OCC * (1 << bits):
        bits += 1
    return bits


def _auto_bits_col(n_col: Column) -> Column:
    """bits as a COLUMN over a count column — the same thresholds as
    :func:`auto_band_bits`, expressed declaratively so geometry
    selection rides the broadcast stats join (no driver action)."""
    bits = F.lit(AUTO_BITS_MIN)
    for b in range(AUTO_BITS_MIN, AUTO_BITS_MAX):
        bits = bits + F.when(
            n_col > AUTO_TARGET_OCC * (1 << b), F.lit(1)
        ).otherwise(F.lit(0))
    return bits


def _auto_mod_col(bits_col: Column) -> Column:
    """2^bits as a COLUMN (the band-word modulus) — an 8-way CASE over
    the clamped bits range, evaluated once per corpus in the broadcast
    stats frame."""
    mod = F.lit(0).cast("long")
    for b in range(AUTO_BITS_MIN, AUTO_BITS_MAX + 1):
        mod = F.when(bits_col == b, F.lit(1 << b).cast("long")).otherwise(mod)
    return mod


def _emb_auto_band_keys(vec_col: str, mod_col: Column, bands: int = EMB_BANDS) -> list:
    """Band keys with RUNTIME width: band j's 21-bit sign word is built
    from STATIC coordinate indices (fixed stride AUTO_BITS_MAX, block j
    = coordinates [21j, 21j+21) — max index 63 <= dim 64), then masked
    to the corpus-derived width by ONE modulus against the broadcast
    2^bits column. The first cut gated each of the 21 terms on
    ``i < bits`` with a COMPUTED element_at index — 63 dynamic branches
    per row that benched the sf0.1 entry at ~2x its old wall; the
    static-word-then-mask form keeps the whole projection
    constant-foldable except a single % per band. Narrower geometries
    are PREFIXES of wider ones under this layout (bits 15 keeps bit 14
    of the same block), so growing the corpus only refines buckets."""
    keys = []
    for j in range(bands):
        word = F.lit(0).cast("long")
        for i in range(AUTO_BITS_MAX):
            word = word + F.when(
                F.get(F.col(vec_col), j * AUTO_BITS_MAX + i) > 0,
                F.lit(1 << i).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        keys.append(F.lit(j << AUTO_BAND_SHIFT).cast("long") + word % mod_col)
    return keys


def emb_auto_band_keys_sql(
    vec_col: str = "embedding", bands: int = EMB_BANDS, mod_col: str = "m"
) -> str:
    """DuckDB twin of :func:`_emb_auto_band_keys` — same namespace
    shift, same static stride-21 sign words, same modulus mask."""
    return ", ".join(
        str(j << AUTO_BAND_SHIFT)
        + " + (("
        + " + ".join(
            f"(CASE WHEN {vec_col}[{j * AUTO_BITS_MAX + i + 1}] > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(AUTO_BITS_MAX)
        )
        + f") % {mod_col})"
        for j in range(bands)
    )


def auto_bits_sql(n_col: str = "n") -> str:
    """The geometry rule as a SQL expression over a count column."""
    terms = " + ".join(
        f"(CASE WHEN {n_col} > {AUTO_TARGET_OCC * (1 << b)} THEN 1 ELSE 0 END)"
        for b in range(AUTO_BITS_MIN, AUTO_BITS_MAX)
    )
    return f"{AUTO_BITS_MIN} + {terms}"


def embedding_near_dup_pairs(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = DEFAULT_COSINE_TAU,
    bucket_cap: int | None = None,
    band_bits: int | None = None,
    split_verify: bool | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine ≥ tau that share at
    least one hyperplane-sign band (EMB_BANDS bands of
    leading-coordinate signs; standard LSH OR-amplification). Candidates
    come from an equi-join on the band key — never an all-pairs product;
    pairs matching in several bands are collapsed by a distinct on the
    (ids, cosine) triple, which is deterministic per pair. Sign-flip
    misses (a near-dup whose perturbation crosses a hyperplane in every
    band) are identical on both engines, so oracle parity holds.

    ``band_bits=None`` (the default since VERDICT r9 task #2) derives
    the band width from the corpus count at plan time — a one-row
    count aggregate broadcast onto the key projection (the repo's
    global-stat crossJoin idiom, no driver action), holding expected
    bucket occupancy ~constant so candidate volume stays ~linear in
    the corpus instead of quadratic at fixed geometry (the measured
    29x sf1 degeneration). An explicit int pins the geometry (the
    fixed-geometry knob entries and tests).

    ``split_verify=None`` resolves to the geometry mode: auto geometry
    holds candidate volume low, which is exactly the regime where the
    candidate-verify split wins (measured at sf1's auto-picked 18
    bits: 14.7 s steady with the static-word mask layout — vs 21.5 s
    for the first gated-term cut, 37.2 s inline, and 47 s for the old
    fixed-14 inline default); fixed geometry keeps the r9-measured
    inline default (the split LOSES at the 35M-candidate volume the
    14-bit geometry produces at sf1).
    """
    from ..plans.training_data import cosine  # local import, avoids cycle

    if split_verify is None:
        split_verify = band_bits is None

    if band_bits is None:
        stats = embs.agg(F.count(F.lit(1)).cast("long").alias("__n")).select(
            _auto_mod_col(_auto_bits_col(F.col("__n"))).alias("__mod")
        )
        keyed = embs.crossJoin(F.broadcast(stats)).select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            F.explode(
                F.array(*_emb_auto_band_keys(vec_col, F.col("__mod")))
            ).alias("band_key"),
        )
    else:
        keyed = embs.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            F.explode(F.array(*_emb_band_keys(vec_col, bits=band_bits))).alias(
                "band_key"
            ),
        )
    if bucket_cap is not None:
        # production hot-bucket cap: a band bucket holding > cap
        # members is a near-certain template cluster whose occ^2
        # candidate blow-up drowns the join at scale; dropping it
        # bounds candidates at cap * n per band. Exact count per key —
        # deterministic, mirrored by the oracle's QUALIFY.
        from pyspark.sql import Window as _W

        occ = _W.partitionBy("band_key")
        keyed = (
            keyed.withColumn("__occ", F.count(F.lit(1)).over(occ))
            .filter(F.col("__occ") <= bucket_cap)
            .drop("__occ")
        )
    if split_verify:
        # candidate-verify split: the band self-join moves (id,
        # band_key) rows only; candidates dedupe to (id_a, id_b), then
        # each pair fetches its two vectors by id and verifies exactly
        # once. WORTH IT only when candidate volume is modest relative
        # to corpus size (the wide-band geometry: measured 28 → 16 s at
        # sf1's 2.3M candidates); at the FIXED 14-bit geometry's 35M
        # sf1 candidates the extra distinct + two fetch shuffles LOSE
        # to the inline form (measured 47 → 79 s) — hence the
        # mode-resolved default: split under auto geometry (which
        # holds candidates low by construction), inline under pinned
        # bits. Same pair set, same cosines either way.
        ids = keyed.select("vid", "band_key")
        cand = (
            ids.select(F.col("vid").alias("id_a"), "band_key")
            .join(
                ids.select(F.col("vid").alias("id_b"), "band_key"), on="band_key"
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        v = embs.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        return (
            cand.join(
                v.select(F.col("vid").alias("id_a"), F.col("vec").alias("vec_a")),
                on="id_a",
            )
            .join(
                v.select(F.col("vid").alias("id_b"), F.col("vec").alias("vec_b")),
                on="id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= tau)
        )
    a = keyed.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "band_key"
    )
    b = keyed.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "band_key"
    )
    return (
        a.join(b, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
        )
        .distinct()
        .filter(F.col("cosine") >= tau)
    )


def emb_band_keys_sql(
    vec_col: str = "embedding", bands: int = EMB_BANDS, bits: int = EMB_BAND_BITS
) -> str:
    """DuckDB twin of :func:`_emb_band_keys`: the comma-separated band
    key expressions (for an ``unnest([...])``), generated from the same
    (bands, bits) parameters so the band layout can't drift between
    the Spark plan and any oracle built on it."""
    return ", ".join(
        str(j << bits)
        + " + "
        + " + ".join(
            f"(CASE WHEN {vec_col}[{j * bits + i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bits)
        )
        for j in range(bands)
    )


def embedding_near_dup_oracle_sql(
    parquet_path: str,
    tau: float = DEFAULT_COSINE_TAU,
    bucket_cap: int | None = None,
    band_bits: int | None = None,
) -> str:
    """DuckDB mirror of :func:`embedding_near_dup_pairs` — generated
    from the same EMB_BANDS constants so the band layout can't drift;
    ``bucket_cap`` mirrors the capped variant's QUALIFY.
    ``band_bits=None`` mirrors the auto geometry: the oracle computes
    the corpus count and the identical integer-threshold bits rule in
    SQL, so both engines always pick the same width at any sf."""
    cap_sql = (
        f"""
    kept AS (SELECT * FROM keyed
             QUALIFY count(*) OVER (PARTITION BY band_key) <= {bucket_cap}),"""
        if bucket_cap is not None
        else """
    kept AS (SELECT * FROM keyed),"""
    )
    if band_bits is None:
        keyed_sql = f"""bits AS (SELECT CAST(1 AS BIGINT) << ({auto_bits_sql("n")}) AS m
                 FROM (SELECT CAST(count(*) AS BIGINT) AS n
                       FROM read_parquet('{parquet_path}'))),
    keyed AS (SELECT vec_id, embedding,
                          unnest([{emb_auto_band_keys_sql()}]) AS band_key
                   FROM read_parquet('{parquet_path}') CROSS JOIN bits),"""
    else:
        keyed_sql = f"""keyed AS (SELECT vec_id, embedding,
                          unnest([{emb_band_keys_sql(bits=band_bits)}]) AS band_key
                   FROM read_parquet('{parquet_path}')),"""
    return f"""
    WITH {keyed_sql}{cap_sql}
    pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
              FROM kept a JOIN kept b USING (band_key)
              WHERE a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {tau}"""


def minhash_band_ctes(parquet_path: str, norm_sql: str) -> str:
    """CTE string (no leading WITH) ending in ``bands(doc_id,
    band_key)`` — the shared shingle→signature→band-key mirror of the
    Spark pipeline, generated from the same constants. Consumed by
    :func:`minhash_oracle_sql` AND the streaming band-owner dedup
    oracle so the two cannot drift structurally."""
    sigs = ",\n             ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s))) AS s{i}"
        for i in range(NUM_HASHES)
    )
    keys = ", ".join(
        "md5('{b}|' || {cols})".format(
            b=b,
            cols=" || '|' || ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)),
        )
        for b in range(BANDS)
    )
    return f"""src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM toks),
    sigs AS (SELECT doc_id, sh,
             {sigs}
      FROM shingled),
    bands AS (SELECT doc_id, unnest([{keys}]) AS band_key FROM sigs)"""


def minhash_oracle_sql(parquet_path: str, norm_sql: str, tau: float = DEFAULT_TAU) -> str:
    """DuckDB mirror of :func:`minhash_near_dup_pairs` — generated from
    the same constants so the two can't drift."""
    return f"""
    WITH {minhash_band_ctes(parquet_path, norm_sql)},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b USING (band_key)
             WHERE a.doc_id < b.doc_id),
    verified AS (SELECT c.doc_a, c.doc_b,
        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
      FROM cand c
      JOIN shingled sa ON sa.doc_id = c.doc_a
      JOIN shingled sb ON sb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {tau}"""


# --------------------------------------------------------------------------
# Connected components: near-dup pairs → duplicate clusters
# --------------------------------------------------------------------------

#: Iteration cap for min-label propagation. Convergence needs at most
#: the component diameter iterations; real dup clusters (copies of one
#: source doc) are near-cliques with diameter ≤ ~3. 50 is a safety
#: backstop, not a truncation — hitting it raises instead of returning
#: a half-propagated labeling.
CC_MAX_ITER = 50


def connected_components(
    edges: DataFrame,
    max_iter: int = CC_MAX_ITER,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) for every node of ``edges`` (doc_a, doc_b),
    where cluster_id is the MINIMUM doc_id reachable in the undirected
    graph — the standard canonical labeling for duplicate clusters.

    Pregel-style min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels (one shuffle join +
    one groupBy per round), stopping at the fixpoint. The driver holds
    only the iteration counter and a has-anything-changed flag — never
    row data — so the loop distributes like any other join pipeline.
    Each round's labels are materialized with the lineage cut, keeping
    round N's plan O(1) instead of O(N) deep.

    ``checkpoint_dir`` selects the materialization strategy:
    ``None`` (default) uses ``localCheckpoint`` — executor-local block
    storage, fastest, right for single-JVM / short loops. On a real
    cluster the executor-local blocks are NOT replicated: an executor
    loss mid-loop kills the job. Passing a (fault-tolerant, e.g. HDFS/
    object-store) directory switches every round to a reliable
    ``checkpoint()``, which survives executor death — the production
    form for long CC loops over 100 TB edge sets.

    Reliable-mode storage discipline: Spark never deletes checkpoint
    files on its own (the ContextCleaner conf is off by default), so a
    naive loop would retain one full label-set copy per round — ~50x
    the label size in the worst case. Each round therefore checkpoints
    into its own subdirectory of ``checkpoint_dir`` and the rounds no
    longer referenced by any live plan are deleted as the loop
    advances (the edges checkpoint stays for the whole loop — `sym` is
    a persist() over it and may recompute from it after executor
    loss; on convergence everything but the FINAL round — which the
    returned DataFrame reads — is removed). If the session had a
    checkpoint dir set, it is restored on exit rather than left
    pointing into ``checkpoint_dir``. The final round's files belong
    to the caller:
    they back the returned DataFrame, so remove ``checkpoint_dir``
    only after consuming it.

    Exact fixpoint labeling is deterministic regardless of partitioning
    or iteration order, which is what makes it oracle-checkable against
    a recursive-CTE transitive closure.
    """
    _restore_ckpt_dir = None
    if checkpoint_dir is not None:
        spark = edges.sparkSession
        sc = spark.sparkContext
        _prev_dir = sc.getCheckpointDir()
        _restore_ckpt_dir = lambda: _prev_dir and sc.setCheckpointDir(_prev_dir)  # noqa: E731
        _hconf = spark._jsc.hadoopConfiguration()
        _jpath = spark._jvm.org.apache.hadoop.fs.Path
        _state = {"round": 0, "live": []}  # live = deletable round dirs

        def _rm(dir_str: str) -> None:
            p = _jpath(dir_str)
            p.getFileSystem(_hconf).delete(p, True)

        def _materialize(df: DataFrame) -> DataFrame:
            sub = f"{checkpoint_dir}/round_{_state['round']}"
            sc.setCheckpointDir(sub)
            out = df.checkpoint(eager=True)
            # round 0 is the edges checkpoint: sym recomputes from it
            # on block eviction, so it lives until the loop ends
            if _state["round"] > 0:
                _state["live"].append(sub)
            _state["round"] += 1
            # the new round is fully materialized; label rounds older
            # than the previous one are unreachable by any plan
            while len(_state["live"]) > 2:
                _rm(_state["live"].pop(0))
            return out

        def _finalize() -> None:
            # keep only the final round (it backs the returned DF)
            for d in _state["live"][:-1]:
                _rm(d)
            if _state["round"] > 1:
                _rm(f"{checkpoint_dir}/round_0")
            _restore_ckpt_dir()

    else:

        def _materialize(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

        def _finalize() -> None:
            pass

    # Materialize the (typically expensive) pair generator ONCE before
    # symmetrizing: a union's branches are evaluated independently, so
    # building sym straight off `edges` would run the whole upstream
    # pipeline twice.
    edges = _materialize(edges.select("doc_a", "doc_b"))
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist()
    )
    # Initial labeling already folds in round 1: L1(v) = min(v, min
    # neighbor id) comes out of the SAME shuffle that builds the node
    # set (groupBy src instead of distinct src), so the loop below
    # starts one propagation ahead at zero extra cost.
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("min_nbr"))
        .select("node", F.least("node", "min_nbr").alias("label"))
    )
    labels = _materialize(labels)
    for _ in range(max_iter):
        # One aggregate does the whole round: neighbor labels (own=0)
        # union the node's current label (own=1); min over both is the
        # propagated label, and max(label WHERE own=1) recovers the old
        # label from the same groups — so convergence detection costs a
        # cheap scan of the checkpointed result instead of a second
        # shuffle join against the previous labeling.
        nbr = sym.join(
            labels.select(F.col("node").alias("dst"), "label"), on="dst"
        ).select(F.col("src").alias("node"), "label", F.lit(0).alias("own"))
        step = (
            nbr.union(labels.select("node", "label", F.lit(1).alias("own")))
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("own") == 1, F.col("label"))).alias("old_label"),
            )
        )
        step = _materialize(step)
        labels = step.select("node", "label")
        changed = step.filter(F.col("label") != F.col("old_label")).limit(1).count()
        if changed == 0:
            sym.unpersist()
            _finalize()
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    # non-convergence: leave the round dirs in place for debugging, but
    # never leave the session's checkpoint dir pointing at them
    if _restore_ckpt_dir is not None:
        _restore_ckpt_dir()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dup_clusters(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_keeper) over near-dup
    ``pairs`` (doc_a, doc_b): transitive closure into clusters, min
    doc_id as the canonical keeper. Docs in no pair are not emitted —
    at dedup time absence means 'keep, not a duplicate'."""
    labels = connected_components(pairs.select("doc_a", "doc_b"))
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return labels.join(sizes, on="cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def dup_clusters_oracle_sql(pairs_sql: str) -> str:
    """DuckDB mirror of :func:`dup_clusters`: recursive-CTE transitive
    closure (exact, so it agrees with the Spark fixpoint labeling no
    matter how either engine ordered the propagation)."""
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a AS node, b AS r FROM edges
              UNION
              SELECT x.node, e.b FROM reach x JOIN edges e ON e.a = x.r),
    lab AS (SELECT node AS doc_id, min(r) AS mr FROM reach GROUP BY node),
    cl AS (SELECT doc_id,
                  CASE WHEN mr < doc_id THEN mr ELSE doc_id END AS cluster_id
           FROM lab),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM cl GROUP BY cluster_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           (c.doc_id = c.cluster_id) AS is_keeper
    FROM cl c JOIN sizes s USING (cluster_id)"""


# --------------------------------------------------------------------------
# edit-distance similarity join (Ed-Join / segment-filter family)
# --------------------------------------------------------------------------

ED_SEGMENT_CHARS = 20  # anchor-segment length for the pigeonhole filter
ED_MIN_LEN = 2 * ED_SEGMENT_CHARS + 1  # segments must be disjoint


def edit_distance_pairs(
    docs: DataFrame,
    norm: Column,
    id_col: str = "doc_id",
    max_dist: int = 1,
) -> DataFrame:
    """(id_a, id_b, edit_distance) for pairs of docs within ``max_dist``
    (=1) character edits of each other, via the segment pigeonhole
    filter (Ed-Join family): a single edit cannot touch BOTH the first
    ``ED_SEGMENT_CHARS`` chars and the last ``ED_SEGMENT_CHARS`` chars
    when they are disjoint (text length ≥ ED_MIN_LEN — shorter docs are
    excluded), so every ED≤1 pair shares the exact prefix segment or
    the exact suffix segment. Candidates come from an equi-join on
    those two anchored segment keys — never an all-pairs product, and
    the keys are high-cardinality on natural text. Verification runs
    Spark's threshold-bounded ``levenshtein(a, b, max_dist)`` (O(n·τ)
    banded DP, returns -1 above the bound) JVM-side on candidates only.

    Only supports ``max_dist=1``: the two-segment pigeonhole is
    complete exactly for one edit (τ edits need τ+1 segments with
    position-tolerant matching — a different candidate scheme).
    """
    if max_dist != 1:
        raise ValueError("edit_distance_pairs implements the ED<=1 two-segment filter")
    keyed = (
        docs.select(F.col(id_col).alias("vid"), norm.alias("t"))
        .filter(F.length("t") >= ED_MIN_LEN)
        .select(
            "vid",
            "t",
            F.explode(
                F.array(
                    F.concat(F.lit("p"), F.substring(F.col("t"), 1, ED_SEGMENT_CHARS)),
                    F.concat(F.lit("s"), F.substring(F.col("t"), -ED_SEGMENT_CHARS, ED_SEGMENT_CHARS)),
                )
            ).alias("seg_key"),
        )
    )
    a = keyed.select(F.col("vid").alias("id_a"), F.col("t").alias("t_a"), "seg_key")
    b = keyed.select(F.col("vid").alias("id_b"), F.col("t").alias("t_b"), "seg_key")
    return (
        a.join(b, on="seg_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.levenshtein("t_a", "t_b", max_dist).alias("edit_distance"))
        .filter(F.col("edit_distance") >= 0)
        .distinct()
    )


def edit_distance_oracle_sql(parquet_path: str, norm_sql: str) -> str:
    """DuckDB mirror of :func:`edit_distance_pairs` — same segment
    keys, same length gate, full levenshtein on candidates."""
    k = ED_SEGMENT_CHARS
    return f"""
    WITH n AS (SELECT doc_id, {norm_sql} AS t FROM read_parquet('{parquet_path}')),
    keyed AS (SELECT doc_id, t,
                     unnest(['p' || substr(t, 1, {k}), 's' || right(t, {k})]) AS seg_key
              FROM n WHERE length(t) >= {ED_MIN_LEN}),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.t AS t_a, b.t AS t_b
             FROM keyed a JOIN keyed b USING (seg_key)
             WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(levenshtein(t_a, t_b) AS INT) AS edit_distance
    FROM cand WHERE levenshtein(t_a, t_b) <= 1"""
#: containment verify threshold: |A∩B| / min(|A|,|B|) — detects a short
#: doc embedded in a long one, where Jaccard stays low
DEFAULT_TAU_CONTAINMENT = 0.8


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    tau: float = DEFAULT_TAU_CONTAINMENT,
    max_df: int = NGRAM_MAX_DF,
) -> DataFrame:
    """(doc_a, doc_b, containment, jaccard) for pairs whose shingle-set
    CONTAINMENT |A∩B| / min(|A|,|B|) ≥ tau — the asymmetric near-dup
    measure that catches a short document embedded verbatim inside a
    long one (quotes, doc-in-doc, page-with-boilerplate-wrapper), which
    Jaccard misses by construction: a 50-shingle doc inside a
    5000-shingle doc has containment 1.0 but Jaccard 0.01, under any
    symmetric threshold. Same inverted-index spine as
    :func:`ngram_jaccard_pairs` (postings self-join, DF cap, the
    intersection count falls out of the join itself); only the final
    ratio differs, and Jaccard rides along for contrast."""
    from pyspark.sql import Window

    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    posting = exploded_shingles(docs, id_col, norm_col)
    kept = (
        posting.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= max_df)
        .drop("df")
        .persist()
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = kept.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("c") / F.least(F.col("n_a"), F.col("n_b")), 6).alias(
                "containment"
            ),
            F.round(
                F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= tau)
    )


def containment_oracle_sql(
    parquet_path: str,
    norm_sql: str,
    tau: float = DEFAULT_TAU_CONTAINMENT,
    max_df: int = NGRAM_MAX_DF,
) -> str:
    """DuckDB mirror of :func:`containment_pairs`."""
    return f"""
    WITH src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM toks),
    posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    kept AS (SELECT doc_id, shingle FROM posting
             QUALIFY count(*) OVER (PARTITION BY shingle) <= {max_df}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM kept a JOIN kept b USING (shingle)
               WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / least(sa.n, sb.n), 6) AS containment,
           round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = shared.doc_a
    JOIN sizes sb ON sb.doc_id = shared.doc_b
    WHERE round(CAST(c AS DOUBLE) / least(sa.n, sb.n), 6) >= {tau}"""


# --------------------------------------------------------------------------
# Bottom-k sketch pair banding: the SIGNATURE-based candidate generator
# for containment / exact-Jaccard near-dup (VERDICT r9 task #1)
# --------------------------------------------------------------------------
#
# The posting-list detectors (ngram_jaccard_pairs / containment_pairs)
# join on the shingle itself, so their candidate volume is
# sum_s df(s)^2 — on a saturated shingle space (every shingle common,
# the measured sf1 fixture regime: all 27k trigrams at df 110+) that
# degenerates quadratically: 30x/23x wall growth for 10x data in
# BENCH_SF1_FULL r9. Signatures fix this the way minhash banding fixed
# it for Jaccard LSH: hash the SET, not the postings.
#
# Sketch: bottom-k (k-min-wise, Cohen's k-mins sketch) — the k
# lexicographically smallest md5(shingle) values per document. Key
# property (containment-friendly, unlike plain minhash banding): if
# x ∈ A and x is among the k smallest of B ⊇-ish A, then x is among
# the k smallest of A too — shared small-hash elements are GUARANTEED
# to appear in both sketches. Candidates = equi-join on md5-compressed
# PAIRS of bottom-k values (r=2 banding over the sketch):
#
#   * Recall for a pair with containment C and size ratio R = n_b/n_a:
#     each of B's bottom-k lands in A∩B with probability ~C/R, so
#     P(candidate) = P(Binom(k, C/R) >= 2) — with k=12: ~1.0 at R<=2,
#     0.84 at R=4, 0.44 at R=8 (verbatim containment C=1). Same-size
#     near-dups (J >= 0.5): P ~ 1.0. Misses are identical md5
#     arithmetic on both engines, so oracle parity is exact.
#   * Collision safety (the scale property): two UNRELATED documents
#     collide only if they share two specific small-ranked shingles —
#     P ~ (k * shingles_per_doc / vocab)^2 / 2, the r=2 discipline that
#     held minhash banding at 2.0x on the same corpus where the
#     posting join hit 30x. Per-doc work is O(shingles log shingles)
#     (one JVM array_sort) + C(k,2) = 66 fixed-width keys.
#   * 100 TB reading: candidates still scale as n^2 * p with constant
#     p; when corpus growth outpaces vocabulary growth, escalate to
#     r=3 triples (p ~ lambda^3/6) exactly as the embedding banding
#     derives its band bits from the corpus count.
#
# Verification is exact and shared: candidates fetch both shingle
# ARRAYS by id and compute |A∩B| with a JVM array_intersect — no
# second pass over the postings, no df cap (the sketch never sees
# document frequency), so the measures are the pure set ratios.

BOTTOMK_K = 12


def bottomk_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    k: int = BOTTOMK_K,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sh, n, bk): distinct word-3-shingle array, its size, and
    the bottom-k sketch (k smallest md5(shingle) hex strings, ascending).
    Callers repartition upstream — the md5 transform is an interpreted
    HOF that must not run on a single input split. ``shingled``
    (optional): a caller-owned persisted (doc_id, sh) frame reused
    across detector families (r13)."""
    if shingled is not None:
        return shingled.select(
            "doc_id",
            "sh",
            F.size("sh").cast("long").alias("n"),
            F.slice(
                F.array_sort(F.transform(F.col("sh"), lambda s: _md5(s))), 1, k
            ).alias("bk"),
        )
    return shingle_docs(docs, id_col, norm_col).select(
        "doc_id",
        "sh",
        F.size("sh").cast("long").alias("n"),
        F.slice(
            F.array_sort(F.transform(F.col("sh"), lambda s: _md5(s))), 1, k
        ).alias("bk"),
    )


def bottomk_pair_keys(sigs: DataFrame) -> DataFrame:
    """(doc_id, pk): one row per unordered pair of bottom-k values,
    md5-compressed to a fixed-width join key (identical in DuckDB, so
    the candidate sets cannot drift between engines). Docs with a
    single shingle emit no keys — a one-shingle doc has no r=2
    signature evidence (documented boundary; the posting-join twin
    keeps recall 1.0 there)."""
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("bk") - 1),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), F.size("bk")),
                lambda j: F.md5(
                    F.encode(
                        F.concat(
                            F.element_at(F.col("bk"), i),
                            F.lit("|"),
                            F.element_at(F.col("bk"), j),
                        ),
                        "UTF-8",
                    )
                ),
            ),
        )
    )
    return sigs.select(
        "doc_id",
        F.explode(
            F.when(F.size("bk") >= 2, pairs).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pk"),
    )


def _bottomk_candidates(sigs: DataFrame, r: int) -> DataFrame:
    """(doc_a, doc_b): unordered candidate pairs sharing at least one
    r-tuple of bottom-k values. Both r levels enumerate over the SAME
    r=2 pair-key frame (66 keys/doc): two docs sharing m bottom-k
    values share exactly C(m,2) pair keys, so the r=3 condition
    "shares a value TRIPLE" (m >= 3) is precisely "shares >= 3 pair
    keys" — a count aggregate on the r=2 join instead of a fresh
    C(12,3)=220-key explode (VERDICT r12 task #7: the explode was the
    board's heaviest registered detector; the shared-frame form
    measured 35 -> 12 s at sf1 with a byte-identical verified set,
    and the DuckDB oracle keeps its literal triple-key enumeration —
    the two constructions define the same candidate set, so parity
    checks the equivalence every round). The r=3 selectivity still
    applies BEFORE the expensive shingle-array verify; what this form
    gives up is only enumeration-grade selectivity inside the count
    aggregate, which is a map-side-combinable shuffle of id pairs.
    Docs with < r shingles emit no candidates on either engine (no
    r-tuple evidence exists; the posting-join twin keeps recall 1.0
    there)."""
    keys = bottomk_pair_keys(sigs)
    joined = keys.select(F.col("doc_id").alias("doc_a"), "pk").join(
        keys.select(F.col("doc_id").alias("doc_b"), "pk"), on="pk"
    ).filter(F.col("doc_a") < F.col("doc_b"))
    if r == 2:
        return joined.select("doc_a", "doc_b").distinct()
    return (
        joined.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_pair_keys"))
        .filter(F.col("n_shared_pair_keys") >= 3)
        .select("doc_a", "doc_b")
    )


def bottomk_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    k: int = BOTTOMK_K,
    eager: bool = True,
    r: int = 2,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, c, n_a, n_b): candidate pairs from bottom-k pair
    banding with their EXACT shingle-set intersection and sizes — the
    shared spine for the signature containment and signature Jaccard
    detectors; each derives its ratio and threshold from these counts.
    ``shingled`` (optional): a caller-owned persisted (doc_id, sh)
    frame reused across detector families (r13).

    Plan shape: signature build (narrow, one array_sort per doc) →
    key explode (66 fixed keys/doc) → hash self-join on pk → distinct
    pair ids → two id-joins to fetch shingle arrays → JVM
    array_intersect. Never all-pairs. With ``eager`` (default) the
    signature cache is released after the (small) verified frame
    materializes — the dhash_near_dup_pairs discipline (ADVICE r9);
    ``eager=False`` keeps the lazy plan for shape assertions and the
    CALLER owns the persisted signature cache (the returned lazy plan
    still references it, so it cannot be released here; registry
    entries clear it via the per-entry ``clearCache()``)."""
    if r not in (2, 3):
        raise ValueError(f"bottom-k banding supports r in (2, 3), got {r}")
    if shingled is None:
        docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    sigs = bottomk_signatures(docs, id_col, norm_col, k, shingled=shingled).persist()
    cand = _bottomk_candidates(sigs, r)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b")
    )
    out = (
        cand.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("c"),
            "n_a",
            "n_b",
        )
    )
    if eager:
        out = out.localCheckpoint()
        sigs.unpersist()
    return out


def containment_sig_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    tau: float = DEFAULT_TAU_CONTAINMENT,
    k: int = BOTTOMK_K,
    eager: bool = True,
    r: int = 2,
    verified: DataFrame | None = None,
) -> DataFrame:
    """Signature-based asymmetric containment: same output contract as
    :func:`containment_pairs` (doc_a, doc_b, containment, jaccard at
    containment >= tau) but candidates come from bottom-k pair banding
    instead of the posting-list self-join — the scale-safe form on
    dense/saturated shingle spaces. No df cap: the exact verify sees
    the full shingle sets. ``r`` picks the banding order: 2 (value
    pairs, the default) or 3 (value triples — the dense-corpus
    escalation with ~lambda^3/6 collision probability). ``verified``
    (optional): a precomputed :func:`bottomk_verified_pairs` frame —
    this detector and the signature-Jaccard twin share it verbatim, so
    a composed entry running both (docs_dedup_ablation) computes the
    candidate+verify spine once (r13)."""
    v = (
        verified
        if verified is not None
        else bottomk_verified_pairs(docs, id_col, norm_col, k, eager=eager, r=r)
    )
    return (
        v.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
            F.round(
                F.col("c").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("c")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= tau)
    )


def ngram_jaccard_sig_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    tau: float = DEFAULT_TAU,
    k: int = BOTTOMK_K,
    eager: bool = True,
    verified: DataFrame | None = None,
) -> DataFrame:
    """Signature-candidate EXACT word-3-gram Jaccard: same output
    contract as :func:`ngram_jaccard_pairs` (doc_a, doc_b, jaccard at
    jaccard >= tau) with bottom-k pair-banding candidates. The Jaccard
    values that survive are exact set ratios (no sketch estimate, no
    df cap); only candidate RECALL is probabilistic, and identically
    so on both engines. ``verified`` (optional): a precomputed shared
    :func:`bottomk_verified_pairs` frame (see containment_sig_pairs)."""
    v = (
        verified
        if verified is not None
        else bottomk_verified_pairs(docs, id_col, norm_col, k, eager=eager)
    )
    return (
        v.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("c")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


def bottomk_cand_ctes(
    parquet_path: str, norm_sql: str, k: int = BOTTOMK_K, r: int = 2
) -> str:
    """CTE string (no leading WITH) ending in ``verified(doc_a, doc_b,
    c, n_a, n_b)`` — the DuckDB mirror of the bottom-k spine, generated
    from the same (k, r) so sketch geometry cannot drift between
    engines."""
    if r == 2:
        keys_cte = f"""keys AS (SELECT doc_id,
                    unnest(flatten(list_transform(range(1, len(bk)), i ->
                      list_transform(range(i + 1, len(bk) + 1), j ->
                        md5(bk[i] || '|' || bk[j]))))) AS pk
             FROM sigs WHERE len(bk) >= 2)"""
    elif r == 3:
        keys_cte = f"""keys AS (SELECT doc_id,
                    unnest(flatten(flatten(list_transform(range(1, len(bk) - 1), i ->
                      list_transform(range(i + 1, len(bk)), j ->
                        list_transform(range(j + 1, len(bk) + 1), l ->
                          md5(bk[i] || '|' || bk[j] || '|' || bk[l]))))))) AS pk
             FROM sigs WHERE len(bk) >= 3)"""
    else:
        raise ValueError(f"bottom-k banding supports r in (2, 3), got {r}")
    return f"""src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM toks),
    sigs AS (SELECT doc_id, sh, len(sh) AS n,
                    list_sort(list_transform(sh, s -> md5(s)))[1:{k}] AS bk
             FROM shingled),
    {keys_cte},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM keys a JOIN keys b USING (pk)
             WHERE a.doc_id < b.doc_id),
    verified AS (SELECT c.doc_a, c.doc_b,
                        CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS c,
                        CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
                 FROM cand c
                 JOIN sigs sa ON sa.doc_id = c.doc_a
                 JOIN sigs sb ON sb.doc_id = c.doc_b)"""


def containment_sig_oracle_sql(
    parquet_path: str,
    norm_sql: str,
    tau: float = DEFAULT_TAU_CONTAINMENT,
    k: int = BOTTOMK_K,
    r: int = 2,
) -> str:
    """DuckDB mirror of :func:`containment_sig_pairs`."""
    return f"""
    WITH {bottomk_cand_ctes(parquet_path, norm_sql, k, r)}
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / least(n_a, n_b), 6) AS containment,
           round(CAST(c AS DOUBLE) / (n_a + n_b - c), 6) AS jaccard
    FROM verified
    WHERE round(CAST(c AS DOUBLE) / least(n_a, n_b), 6) >= {tau}"""


def ngram_jaccard_sig_oracle_sql(
    parquet_path: str,
    norm_sql: str,
    tau: float = DEFAULT_TAU,
    k: int = BOTTOMK_K,
) -> str:
    """DuckDB mirror of :func:`ngram_jaccard_sig_pairs`."""
    return f"""
    WITH {bottomk_cand_ctes(parquet_path, norm_sql, k)}
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / (n_a + n_b - c), 6) AS jaccard
    FROM verified
    WHERE round(CAST(c AS DOUBLE) / (n_a + n_b - c), 6) >= {tau}"""


# --------------------------------------------------------------------------
# LSH Ensemble: size-stratified containment candidates (Zhu,
# Nargesian, Pu, Miller — "LSH Ensemble: Internet-Scale Domain
# Search", VLDB 2016). Closes the bottom-k spine's measured high-ratio
# recall cliff (VERDICT r10 task #1): a small doc verbatim-contained
# in an R=8x larger doc has Jaccard ~1/R, so the symmetric bottom-k
# pair keys catch it with only P(Binom(12, 1/R) >= 2) ~ 0.45.
#
# The paper's mechanism: partition the corpus by set SIZE, and tune
# the MinHash-LSH geometry per stratum so the containment threshold
# t* — converted to the stratum's worst-case Jaccard bound
# J_min = t* / (1 + R_max - t*), where R_max is the largest size
# ratio the stratum pair admits — still meets the recall target.
# The Spark-first expression of the same idea is ONE shared banded
# index plus post-join band MASKING, not a forest of per-stratum
# indexes: every doc computes LSHE_BANDS one-row minhashes (seeded
# md5, codegen explode+agg path — the minhash_signatures_agg
# discipline), emits LSHE_BANDS (band, minhash) keys tagged with its
# size stratum s = floor(log2(n_shingles)) (integer CASE chain, never
# float log2 — ln-ratio log2 is inexact at powers of two on the JVM
# and would drift strata between engines), and the single equi-join
# on (band, minhash) admits a collision only from bands
# g < allot(|s_a - s_b|). Same-stratum pairs (the bulk of a natural
# corpus, ratio <= 2) use 6 bands; distance-1 pairs 11; distance-2
# pairs 23; deeper pairs all 24 — each the smallest b with
# 1 - (1 - J_min)^b >= 0.9 at t* = 0.8 (saturating at LSHE_BANDS for
# d >= 3, a documented recall floor of ~0.70 at the d=3 worst case —
# planted verbatim containment sits at J = 1/R, well above J_min, so
# its measured recall is ~0.96 at ratio 8). One shuffle for the key
# join, exact array_intersect verify, no posting list, no df
# sensitivity: the candidate FP mass is sum over pairs of
# allot(d) * J(pair), concentrated where few bands are admitted.
# --------------------------------------------------------------------------

LSHE_BANDS = 24
#: bands admitted at stratum distance 0 / 1 / 2 (>= 3 -> all bands):
#: smallest b with 1-(1-J_min(d))^b >= 0.9, J_min(d) = 0.8/(1+2^(d+1)-0.8).
LSHE_ALLOT = (6, 11, 23)
#: stratum cap: 2^40 shingles per doc is beyond any real document.
_LSHE_MAX_STRATUM = 40


def _stratum_case_sql(col: str) -> str:
    """LSH-Ensemble size stratum: floor(log2(col)) capped at
    _LSHE_MAX_STRATUM (2^40 shingles per doc is beyond any real
    document)."""
    return floor_log2_case_sql(col, _LSHE_MAX_STRATUM)


def _lshe_allot_sql(d_expr: str) -> str:
    """Band allotment for stratum distance ``d_expr`` — generated from
    LSHE_ALLOT in both engines so the geometry cannot drift."""
    whens = " ".join(f"WHEN {d} THEN {b}" for d, b in enumerate(LSHE_ALLOT))
    return f"CASE {d_expr} {whens} ELSE {LSHE_BANDS} END"


#: band g draws its per-shingle hash from an 8-hex-char (32-bit) slice
#: of md5(seed g//4): disjoint bit ranges of one md5 are independent
#: uniform values, so 6 md5 evaluations per shingle serve all 24 bands
#: (measured ~3x cheaper than 24 md5s; the md5 is shared across its 4
#: slices by codegen subexpression elimination). 32-bit band minima
#: keep unrelated-doc tie probability ~n/2^32 — negligible next to the
#: band's J collision rate — and fixed-width lowercase hex makes the
#: lexicographic min the numeric min on both engines.
_LSHE_SLICES = 4


def lshe_band_minhashes(exploded: DataFrame) -> DataFrame:
    """(doc_id, n, s, h0..h{LSHE_BANDS-1}) from an exploded (doc_id,
    shingle) table: one sliced seeded-md5 minhash per band via the flat
    projection + groupBy(min) codegen path; n is the distinct shingle
    count (the explode input is already distinct per doc) and s its
    size stratum."""
    seeds = {
        m: _md5(F.concat(F.lit(f"e{m}:"), F.col("shingle")))
        for m in range(LSHE_BANDS // _LSHE_SLICES)
    }
    hashed = exploded.select(
        "doc_id",
        *[
            F.substring(
                seeds[g // _LSHE_SLICES], 1 + 8 * (g % _LSHE_SLICES), 8
            ).alias(f"h{g}")
            for g in range(LSHE_BANDS)
        ],
    )
    return (
        hashed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[F.min(f"h{g}").alias(f"h{g}") for g in range(LSHE_BANDS)],
        )
        .withColumn("s", F.expr(_stratum_case_sql("n")).cast("int"))
    )


def lshe_keys(sigs: DataFrame) -> DataFrame:
    """(doc_id, s, g, mh): one row per band — the stratum rides along so
    the candidate join can mask bands by stratum distance without a
    second lookup."""
    bands = F.array(
        *[
            F.struct(F.lit(g).alias("g"), F.col(f"h{g}").alias("mh"))
            for g in range(LSHE_BANDS)
        ]
    )
    return sigs.select("doc_id", "s", F.explode(bands).alias("bx")).select(
        "doc_id", "s", F.col("bx.g").alias("g"), F.col("bx.mh").alias("mh")
    )


def lshe_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    eager: bool = True,
    min_containment: float | None = None,
) -> DataFrame:
    """(doc_a, doc_b, c, n_a, n_b): candidate pairs from size-stratified
    band-masked minhash LSH with their EXACT shingle intersection and
    sizes — the LSH-Ensemble twin of :func:`bottomk_verified_pairs`.

    Plan shape: repartition → shingle (narrow) → explode + LSHE_BANDS
    md5 columns + groupBy min (map-side combine, whole-stage codegen) →
    band explode (LSHE_BANDS fixed rows/doc) → hash self-join on
    (g, mh) with the stratum-distance band mask → distinct pair ids →
    [optional sound upper-bound prefilter, below] → two id-joins to the
    persisted shingle arrays → JVM array_intersect.
    Never all-pairs, never a posting list. With ``eager`` (default) the
    shingle AND band-key caches are released after the verified frame
    materializes; ``eager=False`` keeps the lazy plan for shape
    assertions and the CALLER owns BOTH persisted caches (the returned
    lazy plan still references them; registry entries clear them via
    the per-entry ``clearCache()``) — the bottomk_verified_pairs
    discipline (ADVICE r11/r13).

    ``min_containment`` (r14, guide §2.3/§3.2): when set, pairs whose
    exact containment round(c / least(n_a, n_b), 6) is below the
    threshold are OMITTED from the output, and — the point — most of
    them are dropped *before* the expensive exact verify by a SOUND
    upper bound: per doc, ``ih`` = sorted distinct crc32 of each
    shingle (4-byte ints, ~6x narrower than the shingle strings).
    Whenever crc32 is injective on either side's shingle set (checked
    exactly per doc via size(ih) = n; a violation falls back to exact
    verify for every pair of that doc), distinct shared shingles map to
    distinct shared hashes, so c <= ub = |ih_a ∩ ih_b| and
    round(ub/least, 6) < tau proves round(c/least, 6) < tau. No false
    negatives by construction; false positives (cross-doc collisions)
    only cost a redundant exact verify. Measured sf1 (template-heavy
    corpus, 39.0M band candidates): survivors 14.9k (2600x), the
    string-array attach + array_intersect now runs on survivors only."""
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    shingled = shingle_docs(docs, id_col, norm_col).persist()
    sigs = lshe_band_minhashes(
        shingled.select("doc_id", F.explode("sh").alias("shingle"))
    )
    # persisted: both sides of the (g, mh) self-join consume the key
    # frame; unpersisted, the whole signature pipeline — explode +
    # 6 md5/shingle + 24-way groupBy min, the detector's dominant cost
    # — ran twice (the minhash banded-join precedent; r13
    # optimization, measured ~25% off the sf0.1 detector wall).
    keys = lshe_keys(sigs).persist()
    a = keys.select(
        F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"), "g", "mh"
    )
    b = keys.select(
        F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"), "g", "mh"
    )
    allot = F.expr(_lshe_allot_sql("abs(s_a - s_b)"))
    cand = (
        a.join(b, on=["g", "mh"])  # equi-join: never a cartesian product
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.col("g") < allot)
        .select("doc_a", "doc_b")
        .distinct()
    )
    if min_containment is not None:
        # Upper-bound prefilter (docstring): ship 4-byte int sketches
        # through the two pair-keyed attach joins instead of the full
        # shingle-string arrays; the heavy exchange carries ~6x fewer
        # bytes and the per-pair intersect hashes ints, not strings.
        ih_df = shingled.select(
            "doc_id",
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.col("sh"),
                        # crc32 is a 32-bit value carried in a BIGINT;
                        # recenter by 2^31 so the 4-byte cast is
                        # bijective and ANSI-safe (a bare cast overflows
                        # for hashes >= 2^31).
                        lambda s: (
                            F.crc32(F.encode(s, "UTF-8")) - F.lit(2147483648)
                        ).cast("int"),
                    )
                )
            ).alias("ih"),
            F.size("sh").alias("n"),
        )
        ia = ih_df.select(
            F.col("doc_id").alias("doc_a"),
            F.col("ih").alias("ih_a"),
            F.col("n").alias("n_a"),
        )
        ib = ih_df.select(
            F.col("doc_id").alias("doc_b"),
            F.col("ih").alias("ih_b"),
            F.col("n").alias("n_b"),
        )
        ub = F.size(F.array_intersect("ih_a", "ih_b"))
        keep = (
            (
                F.round(ub / F.least("n_a", "n_b"), 6)
                >= F.lit(float(min_containment))
            )
            # soundness guard: crc32 collided INSIDE a doc's shingle
            # set (size(ih) < n) — the bound does not apply, verify
            # exactly. Checked per doc, so the prefilter is exact-safe
            # on any input, not just collision-free fixtures.
            | (F.size("ih_a") < F.col("n_a"))
            | (F.size("ih_b") < F.col("n_b"))
        )
        cand = (
            cand.join(ia, on="doc_a")
            .join(ib, on="doc_b")
            .filter(keep)
            .select("doc_a", "doc_b")
        )
    sa = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    out = (
        cand.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("c"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
    )
    if min_containment is not None:
        out = out.filter(
            F.round(F.col("c") / F.least("n_a", "n_b"), 6)
            >= F.lit(float(min_containment))
        )
    if eager:
        out = out.localCheckpoint()
        shingled.unpersist()
        keys.unpersist()
    return out


def containment_lshe_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    norm_col: str = "norm",
    tau: float = DEFAULT_TAU_CONTAINMENT,
    eager: bool = True,
) -> DataFrame:
    """Size-stratified (LSH Ensemble) asymmetric containment: the same
    output contract as :func:`containment_pairs` /
    :func:`containment_sig_pairs` (doc_a, doc_b, containment, jaccard
    at containment >= tau) with candidates that keep deep-ratio recall
    — the scale-safe detector for small-doc-inside-huge-doc pairs the
    bottom-k spine's measured curve loses past ratio ~4.

    ``min_containment=tau`` pushes the threshold into the verify spine
    (r14): the sound crc32 upper-bound prefilter drops sub-tau pairs
    before the exact array_intersect, and the containment filter below
    is then a no-op re-assertion on the already-thresholded frame."""
    v = lshe_verified_pairs(
        docs, id_col, norm_col, eager=eager, min_containment=tau
    )
    return v.select(
        "doc_a",
        "doc_b",
        F.round(F.col("c").cast("double") / F.least("n_a", "n_b"), 6).alias(
            "containment"
        ),
        F.round(
            F.col("c").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("c")),
            6,
        ).alias("jaccard"),
    ).filter(F.col("containment") >= tau)


def lshe_cand_ctes(parquet_path: str, norm_sql: str) -> str:
    """CTE string (no leading WITH) ending in ``verified(doc_a, doc_b,
    c, n_a, n_b)`` — the DuckDB mirror of the LSH-Ensemble spine,
    generated from the same band count / allotment constants so sketch
    geometry cannot drift between engines."""
    return f"""src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM src),
    shingled AS (SELECT doc_id,
        list_distinct(CASE WHEN len(t) < {SHINGLE_WORDS} THEN [norm]
             ELSE list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      FROM toks),
    sigs AS (SELECT doc_id, sh, len(sh) AS n,
                    {_stratum_case_sql("len(sh)")} AS s,
                    list_transform(range(0, {LSHE_BANDS}), g ->
                      list_min(list_transform(sh, x ->
                        substr(md5('e' || CAST(g // {_LSHE_SLICES} AS VARCHAR)
                                   || ':' || x),
                               1 + 8 * (g % {_LSHE_SLICES}), 8)))) AS mhs
             FROM shingled),
    keys AS (SELECT doc_id, s, t.g AS g, mhs[t.g + 1] AS mh
             FROM sigs CROSS JOIN range(0, {LSHE_BANDS}) AS t(g)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM keys a JOIN keys b ON a.g = b.g AND a.mh = b.mh
             WHERE a.doc_id < b.doc_id
               AND a.g < {_lshe_allot_sql("abs(a.s - b.s)")}),
    verified AS (SELECT c.doc_a, c.doc_b,
                        CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS c,
                        CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
                 FROM cand c
                 JOIN sigs sa ON sa.doc_id = c.doc_a
                 JOIN sigs sb ON sb.doc_id = c.doc_b)"""


def containment_lshe_oracle_sql(
    parquet_path: str,
    norm_sql: str,
    tau: float = DEFAULT_TAU_CONTAINMENT,
) -> str:
    """DuckDB mirror of :func:`containment_lshe_pairs`."""
    return f"""
    WITH {lshe_cand_ctes(parquet_path, norm_sql)}
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / least(n_a, n_b), 6) AS containment,
           round(CAST(c AS DOUBLE) / (n_a + n_b - c), 6) AS jaccard
    FROM verified
    WHERE round(CAST(c AS DOUBLE) / least(n_a, n_b), 6) >= {tau}"""


# --------------------------------------------------------------------------
# Substring-grain exact dedup: repeated token spans within/across docs
# (VERDICT r9 task #4 — the Lee et al. 2022 "Deduplicating Training
# Data Makes Language Models Better" modality: verbatim runs shorter
# than a document, which document-grain dedup structurally misses)
# --------------------------------------------------------------------------
#
# Suffix arrays are the single-machine tool for this; the Spark shape
# is window fingerprinting: every SPAN_WINDOW-token window (stride 1)
# hashes to md5(window text); a window occurring >= 2 times GLOBALLY
# (across documents or repeated within one) is duplicated; per
# document, runs of consecutive duplicated window positions merge into
# maximal spans (gaps-and-islands over the position sequence). A
# planted span of len >= SPAN_WINDOW tokens shared by >= 2 docs is
# recovered EXACTLY: its len - SPAN_WINDOW + 1 interior windows are
# all global dups, its boundary-crossing windows are not (fresh
# neighbors), so the island is [pos, pos + len) to the token.
#
# Scale shape — NO pair join anywhere: the duplicated-window test is a
# map-side-combinable count >= 2 per fingerprint (a boilerplate window
# at df 10^6 costs one count row, never df^2 candidates), the merge is
# a per-document window function. Work is O(tokens * SPAN_WINDOW)
# hashing + two shuffles (fingerprint count, document regroup).

SPAN_WINDOW = 8


def window_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", norm_col: str = "norm", w: int = SPAN_WINDOW
) -> DataFrame:
    """(doc_id, p, fp): md5 fingerprint of the w-token window starting
    at 0-based token position p, one row per position. Docs shorter
    than w tokens emit nothing (no w-window exists). The generator
    input stays an inline expression over the materialized token
    column (the exploded_shingles discipline)."""
    wins = F.expr(
        f"transform(sequence(0, size(__tokens) - {w}), p -> "
        f"struct(CAST(p AS BIGINT) AS p, "
        f"md5(concat_ws(' ', slice(__tokens, p + 1, {w}))) AS fp))"
    )
    return (
        _tokens_projection(docs, id_col, norm_col)
        .filter(F.size("__tokens") >= w)
        .select("doc_id", F.explode(wins).alias("wx"))
        .select("doc_id", F.col("wx.p").alias("p"), F.col("wx.fp").alias("fp"))
    )


def repeated_spans(
    docs: DataFrame, id_col: str = "doc_id", norm_col: str = "norm", w: int = SPAN_WINDOW
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_windows): maximal
    token intervals whose every w-window occurs >= 2 times in the
    corpus (counting within-document repeats — a doc that quotes
    itself twice is two hits). span_end is exclusive; span_tokens =
    span_end - span_start >= w always."""
    from pyspark.sql import Window

    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    # The duplicated-window test is a COUNT WINDOW over fp, not an
    # aggregate + join-back (r13 optimization): the old agg+join shape
    # hashed every O(tokens * w) md5 fingerprint TWICE (the dup
    # aggregate and the join probe are separate subtrees — different
    # exchange projections, so ReuseExchange cannot collapse them) and
    # shuffled wins by fp twice. One window pass computes occ on the
    # single fp shuffle the join already paid; a hot boilerplate fp
    # still costs O(df) within its task — the same colocation the hash
    # join imposed — never df^2. Measured sf0.1 2.7 -> 1.6 s isolated;
    # values byte-identical (the oracle keeps agg+join, so parity
    # re-proves the equivalence every round).
    wins = window_fingerprints(docs, id_col, norm_col, w)
    hits = (
        wins.withColumn(
            "occ", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("occ") >= 2)
        .select("doc_id", "p")
    )
    isl = hits.withColumn(
        "grp",
        F.col("p")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("p")),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + w).cast("long").alias("span_end"),
            (F.max("p") + w - F.min("p")).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .drop("grp")
    )


def repeated_span_sources(
    docs: DataFrame, id_col: str = "doc_id", norm_col: str = "norm", w: int = SPAN_WINDOW
) -> DataFrame:
    """:func:`repeated_spans` plus SOURCE ATTRIBUTION (VERDICT r10 task
    #5): (doc_id, span_start, span_end, span_tokens, n_windows,
    src_doc, run_hosts) where ``src_doc`` is the LOWEST doc_id sharing
    any window fingerprint of the span (keep-lowest-doc_id as the
    canonical source — the deterministic "scrub here, keep there" rule:
    keep the row with doc_id == src_doc at the lowest span_start, scrub
    every other occurrence) and ``run_hosts`` is the minimum over the
    span's windows of the per-fingerprint DISTINCT host-doc count.
    ``run_hosts`` is exact whenever the run is shared verbatim (every
    host contains every window — the planted / Lee et al. 2022 case)
    and an upper bound on whole-run hosts otherwise.

    Scale shape — still NO pair join and no posting self-join: the
    quadratic way to attribute is joining hit positions back to the
    full posting list (sum of occ^2 rows — a 10^6-host boilerplate
    window would pay 10^12), so attribution instead rides the
    fingerprint groupBy itself: per-fp min(doc_id) and distinct-host
    count are map-side-combinable aggregates over sum(occ) rows, and
    the span merge takes min() of both under the same gaps-and-islands
    window as the base detector."""
    from pyspark.sql import Window

    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    # Same one-pass window shape as repeated_spans (r13): occ and
    # fp_src ride a plain fp window; the distinct-host count uses the
    # max(dense_rank over (fp, doc_id)) identity — dense_rank assigns
    # equal doc_ids equal ranks, so its per-fp max IS the distinct
    # count — on the same single fp exchange (one extra in-partition
    # sort, no second fingerprint pass, no join). Values byte-identical
    # to the agg+join form the oracle keeps.
    wins = window_fingerprints(docs, id_col, norm_col, w)
    wfp = Window.partitionBy("fp")
    wfpo = Window.partitionBy("fp").orderBy("doc_id")
    hits = (
        wins.withColumn("occ", F.count(F.lit(1)).over(wfp))
        .withColumn("fp_src", F.min("doc_id").over(wfp))
        .withColumn(
            "fp_hosts",
            F.max(F.dense_rank().over(wfpo)).over(wfp).cast("long"),
        )
        .filter(F.col("occ") >= 2)
        .select("doc_id", "p", "fp_src", "fp_hosts")
    )
    isl = hits.withColumn(
        "grp",
        F.col("p")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("p")),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + w).cast("long").alias("span_end"),
            (F.max("p") + w - F.min("p")).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.min("fp_src").cast("long").alias("src_doc"),
            F.min("fp_hosts").cast("long").alias("run_hosts"),
        )
        .drop("grp")
    )


def repeated_span_sources_oracle_sql(
    parquet_path: str, norm_sql: str, w: int = SPAN_WINDOW
) -> str:
    """DuckDB mirror of :func:`repeated_span_sources`."""
    return f"""
    WITH src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, string_split(norm, ' ') AS t FROM src),
    pos AS (SELECT doc_id, t, unnest(range(0, len(t) - {w} + 1)) AS p
            FROM toks WHERE len(t) >= {w}),
    wins AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
                    md5(array_to_string(t[p + 1 : p + {w}], ' ')) AS fp
             FROM pos),
    hosts AS (SELECT fp, CAST(min(doc_id) AS BIGINT) AS fp_src,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS fp_hosts
              FROM wins GROUP BY fp),
    dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2),
    hits AS (SELECT w.doc_id, w.p, h.fp_src, h.fp_hosts
             FROM wins w JOIN dup USING (fp) JOIN hosts h USING (fp)),
    isl AS (SELECT doc_id, p, fp_src, fp_hosts,
                   p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
            FROM hits)
    SELECT doc_id,
           CAST(min(p) AS BIGINT) AS span_start,
           CAST(max(p) + {w} AS BIGINT) AS span_end,
           CAST(max(p) + {w} - min(p) AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(min(fp_src) AS BIGINT) AS src_doc,
           CAST(min(fp_hosts) AS BIGINT) AS run_hosts
    FROM isl GROUP BY doc_id, grp"""


def repeated_spans_oracle_sql(
    parquet_path: str, norm_sql: str, w: int = SPAN_WINDOW
) -> str:
    """DuckDB mirror of :func:`repeated_spans` — same window width,
    same md5 window text, same gaps-and-islands merge."""
    return f"""
    WITH src AS (SELECT doc_id, {norm_sql} AS norm
                 FROM read_parquet('{parquet_path}')),
    toks AS (SELECT doc_id, string_split(norm, ' ') AS t FROM src),
    pos AS (SELECT doc_id, t, unnest(range(0, len(t) - {w} + 1)) AS p
            FROM toks WHERE len(t) >= {w}),
    wins AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
                    md5(array_to_string(t[p + 1 : p + {w}], ' ')) AS fp
             FROM pos),
    dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2),
    hits AS (SELECT doc_id, p FROM wins JOIN dup USING (fp)),
    isl AS (SELECT doc_id, p,
                   p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
            FROM hits)
    SELECT doc_id,
           CAST(min(p) AS BIGINT) AS span_start,
           CAST(max(p) + {w} AS BIGINT) AS span_end,
           CAST(max(p) + {w} - min(p) AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, grp"""
