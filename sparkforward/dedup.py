"""Deduplication operators for large-scale corpus pipelines.

* :func:`exact_duplicates` — hash-groupBy on ``md5(text)``; the partial
  aggregation makes this one vocabulary-of-hashes-sized shuffle.
* :func:`minhash_near_duplicates` — MinHash + LSH banding over distinct
  token sets: signature (map-side after one token explode), band buckets,
  bucket self-join for candidates, exact-Jaccard verification. All hash
  functions are ``md5`` so the DuckDB oracle can reproduce results exactly.
* :func:`simhash` — 64-bit SimHash fingerprints (Spark-only; pytest-verified).

Scale notes: the bucket self-join is the classic LSH trick — candidate pairs
are generated per-bucket, never corpus x corpus. A pathological bucket (all
near-identical docs) produces a quadratic bucket; the band key includes the
band index so hot buckets split across ``NUM_BANDS`` keys, and at real scale
the bucket join runs under AQE skew handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkforward.tokenize import SPLIT_PATTERN

NUM_HASHES = 8
ROWS_PER_BAND = 2
NUM_BANDS = NUM_HASHES // ROWS_PER_BAND
JACCARD_THRESHOLD = 0.7


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_md5, n_docs, rep_doc_id) for every exactly-duplicated text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _token_set_arrays(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, terms: array<string>) — distinct terms per doc, un-exploded.

    The verify joins consume this shape: one row per candidate pair with two
    array columns and a JVM ``array_intersect``, instead of re-exploding
    token sets into |tokens| rows per candidate (round-1 audit note).
    """
    return docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), SPLIT_PATTERN),
                lambda t: t != "",
            )
        ).alias("terms"),
    )


def _token_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) with distinct terms per doc."""
    return _token_set_arrays(docs, text_col).select(
        "doc_id", F.explode("terms").alias("term")
    )


def _verify_jaccard(
    cand: DataFrame, arrays: DataFrame, threshold: float, item_col: str
) -> DataFrame:
    """Exact Jaccard over candidate pairs via one array_intersect per pair.

    ``cand``: (doc_a, doc_b); ``arrays``: (doc_id, <item_col>: array).
    """
    a = arrays.select(F.col("doc_id").alias("doc_a"), F.col(item_col).alias("_sa"))
    b = arrays.select(F.col("doc_id").alias("doc_b"), F.col(item_col).alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = F.round(
        inter.cast("double") / (F.size("_sa") + F.size("_sb") - inter), 6
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature_arrays(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sigs: array<string>[NUM_HASHES]) — map-side MinHash.

    Each signature component is ``array_min(transform(terms, t ->
    md5(h || ':' || t)))`` over the doc's distinct-token array — pure JVM
    narrow projection, so signatures exist BEFORE any Exchange (round 2
    shipped an explode(tokens x NUM_HASHES) -> groupBy(doc_id, h) shape
    that shuffled 8x the token volume; pinned by tests/test_plans.py)."""
    arrays = _token_set_arrays(docs, text_col)

    def _mh(h: int):
        # one-arg lambda factory: a two-parameter lambda would be read by
        # F.transform as (element, index) and clobber the hash-id binding
        return lambda t: F.md5(F.concat(F.lit(f"{h}:"), t))

    sig = F.array(
        *[F.array_min(F.transform(F.col("terms"), _mh(h))) for h in range(NUM_HASHES)]
    )
    return arrays.select("doc_id", sig.alias("sigs"))


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h, mh) — MinHash signature rows, md5-based (oracle-matching).

    Row view of :func:`minhash_signature_arrays`; still shuffle-free."""
    return minhash_signature_arrays(docs, text_col).select(
        "doc_id", F.posexplode("sigs").alias("h", "mh")
    )


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by exact Jaccard.

    Band keys are computed map-side from the signature array (md5 of the
    band's components in h order, identical to the oracle's
    ``string_agg(mh ORDER BY h)``); the only shuffles in the whole
    operator are the bucket self-join and the final distinct."""
    sig = minhash_signature_arrays(docs, text_col)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).cast("bigint").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sigs")[b * ROWS_PER_BAND + r]
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_entries).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(
        cand, _token_set_arrays(docs, text_col), threshold, "terms"
    )


def minhash_oracle_sql(source: str = "documents") -> str:
    """DuckDB oracle for :func:`minhash_near_duplicates` — same hashes,
    same banding — over ``source`` (a table name or parenthesized
    subquery exposing (doc_id, text))."""
    return f"""
WITH tokset AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
    regexp_split_to_array(lower(text), '{SPLIT_PATTERN}'), t -> t <> ''))) AS term
  FROM {source}
),
hs AS (SELECT unnest(range({NUM_HASHES})) AS h),
sig AS (
  SELECT doc_id, h, min(md5(h::VARCHAR || ':' || term)) AS mh
  FROM tokset CROSS JOIN hs GROUP BY doc_id, h
),
bands AS (
  SELECT doc_id, h // {ROWS_PER_BAND} AS band,
         md5(string_agg(mh, ',' ORDER BY h)) AS band_key
  FROM sig GROUP BY doc_id, h // {ROWS_PER_BAND}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM tokset GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN tokset ta ON ta.doc_id = c.doc_a
  JOIN tokset tb ON tb.doc_id = c.doc_b AND ta.term = tb.term
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) >= {JACCARD_THRESHOLD}
"""


#: the documents-table instantiation (kept as the module constant the
#: dedup_minhash gate entry has always exported)
MINHASH_SQL = minhash_oracle_sql("documents")


NGRAM_N = 3
NGRAM_JACCARD_THRESHOLD = 0.5


def _shingle_arrays(
    docs: DataFrame, text_col: str = "text", n: int = NGRAM_N
) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct token n-grams, JVM-side.

    Shingle = space-joined n consecutive tokens (positions via a transform
    over the token array — no Python, no explode-then-window shuffle).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), SPLIT_PATTERN), lambda t: t != ""
    )
    # sequence(0, x) with x < 0 would generate a DESCENDING range in Spark —
    # guard short docs with an empty array instead
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.array_distinct(grams).alias("shingles"))


def _shingles(docs: DataFrame, text_col: str = "text", n: int = NGRAM_N) -> DataFrame:
    """(doc_id, shingle) — exploded form of :func:`_shingle_arrays`."""
    return _shingle_arrays(docs, text_col, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )


#: candidate-generation df cap: shingles shared by more docs than this are
#: boilerplate (navbars, footers, licenses) and are excluded from the
#: candidate self-join — one viral shingle in k docs would otherwise emit
#: k^2/2 candidate rows. The exact-Jaccard verify still runs over FULL
#: shingle sets, so capped pairs that share any sub-cap shingle are scored
#: correctly; pairs whose ONLY overlap is boilerplate are (deliberately)
#: not near-duplicates.
NGRAM_DF_CAP = 1000


def _ngram_candidates(
    sh: DataFrame, df_cap: int = NGRAM_DF_CAP
) -> DataFrame:
    """(doc_a, doc_b) distinct candidate pairs from sub-cap shingles only."""
    cold = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= int(df_cap))
        .select("shingle")
    )
    pruned = sh.join(cold, "shingle")
    a = pruned.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    n: int = NGRAM_N,
    threshold: float = NGRAM_JACCARD_THRESHOLD,
    df_cap: int = NGRAM_DF_CAP,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact n-gram-shingle Jaccard near-dup pairs.

    Candidate pairs come from the shingle self-join restricted to shingles
    with df <= ``df_cap`` (see NGRAM_DF_CAP — the skew guard that keeps one
    boilerplate shingle from emitting a quadratic candidate set, the same
    pattern as head-term salting); Jaccard is then computed exactly from
    the FULL shingle sets of each candidate pair.
    """
    arrays = _shingle_arrays(docs, text_col, n)
    sh = arrays.select("doc_id", F.explode("shingles").alias("shingle"))
    cand = _ngram_candidates(sh, df_cap)
    return _verify_jaccard(cand, arrays, threshold, "shingles")


NGRAM_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{SPLIT_PATTERN}'), t -> t <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, g.shingle
  FROM toks, unnest(list_transform(
        range(1, greatest(len(ts) - {NGRAM_N} + 1, 0) + 1),
        i -> array_to_string(ts[i : i + {NGRAM_N} - 1], ' '))) AS g(shingle)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
dfsh AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN dfsh d ON d.shingle = a.shingle AND d.c <= {NGRAM_DF_CAP}
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh ta ON ta.doc_id = c.doc_a
  JOIN sh tb ON tb.doc_id = c.doc_b AND tb.shingle = ta.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) >= {NGRAM_JACCARD_THRESHOLD}
"""


COSINE_DUP_THRESHOLD = 0.45


def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_DUP_THRESHOLD,
) -> DataFrame:
    """(id_a, id_b, cosine) — embedding-cosine near-duplicate pairs.

    This exact variant is the oracle-checkable baseline (self-join); the
    scale path reuses similarity.add_simhash_buckets to generate candidates
    (bucket join) before the exact cosine verify — same verify expression.
    """
    from sparkforward.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


EMBEDDING_DUP_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
            / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
               * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
      >= {COSINE_DUP_THRESHOLD}
"""


def embedding_near_duplicates_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_DUP_THRESHOLD,
    dim: int = 64,
    n_bits: int = 4,
    num_tables: int = 4,
) -> DataFrame:
    """(id_a, id_b, cosine) — the SCALE path for embedding near-dup.

    Candidates come from deterministic-LSH bucket equi-joins (one per
    table, unioned, deduped) — never an all-pairs theta join — then the
    exact cosine verify runs on candidates only (vectors re-joined by id so
    the candidate shuffle moves ids, not vectors). Same verify expression
    and threshold as :func:`embedding_near_duplicates`; output is the
    LSH-recalled subset, reproduced exactly by the DuckDB oracle
    (queries.sql_dedup_embedding_lsh) because bucket assignments use
    similarity.deterministic_planes.
    """
    from sparkforward.similarity import add_deterministic_buckets, cosine_expr

    bucketed = add_deterministic_buckets(
        emb.select(id_col, vec_col), dim, n_bits=n_bits, num_tables=num_tables,
        vec_col=vec_col,
    )
    # multi-probe: pair (a, b) is a candidate when their table-t buckets
    # differ in AT MOST one bit — implemented as an equi-join after
    # exploding ONE side's bucket by {0} U single-bit flips (xor symmetry
    # makes one-sided probing sufficient); recall rises sharply at the same
    # table count, with only a (n_bits+1)-fold blowup of one join side.
    flips = F.array(F.lit(0), *[F.lit(1 << p) for p in range(n_bits)])
    pairs = None
    for t in range(num_tables):
        a = bucketed.select(
            F.col(id_col).alias("id_a"),
            F.explode(
                F.transform(flips, lambda m: F.col(f"bucket_{t}").bitwiseXOR(m))
            ).alias("_bk"),
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(f"bucket_{t}").alias("_bk")
        )
        m = (
            a.join(b, "_bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        pairs = m if pairs is None else pairs.unionByName(m)
    pairs = pairs.distinct()

    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — 1-permutation MinHash over n-gram shingles.

    The md5-min fingerprint is a locality-sensitive document signature
    (equal for exact dups, likely-equal for heavy shingle overlap) and is
    reproducible in ANSI SQL for the oracle. The 64-bit SimHash variant
    (Hamming-distance friendly) is :func:`simhash`.
    """
    sh = _shingles(docs, text_col)
    return sh.groupBy("doc_id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))


DOC_FINGERPRINT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{SPLIT_PATTERN}'), t -> t <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, g.shingle
  FROM toks, unnest(list_transform(
        range(1, greatest(len(ts) - {NGRAM_N} + 1, 0) + 1),
        i -> array_to_string(ts[i : i + {NGRAM_N} - 1], ' '))) AS g(shingle)
)
SELECT doc_id, min(md5(shingle)) AS fingerprint FROM sh GROUP BY doc_id
"""


def simhash(
    docs: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash fingerprints (Arrow-batched NumPy; Spark-only op).

    Per doc: each distinct term contributes its blake2b-64 bit pattern
    weighted +1/-1; the fingerprint is the sign vector re-packed to 64 bits.
    Near-duplicates have small Hamming distance.
    """
    import hashlib

    fields = docs.schema.fields + [T.StructField(out_col, T.LongType())]

    def hash_batches(it):
        from sparkforward.tokenize import tokenize

        for pdf in it:
            out = []
            for text in pdf[text_col]:
                acc = np.zeros(64, dtype=np.int64)
                for term in set(tokenize(text or "")):
                    h = np.uint64(
                        int.from_bytes(
                            hashlib.blake2b(term.encode(), digest_size=8).digest(), "big"
                        )
                    )
                    bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc += np.where(bits == np.uint64(1), 1, -1)
                fp = int(
                    ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                        dtype=np.uint64
                    )
                )
                out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(out, index=pdf.index, dtype="int64")
            yield pdf

    from sparkforward.tokenize import spread_small_input

    return spread_small_input(docs).mapInPandas(
        hash_batches, schema=T.StructType(fields)
    )


# --------------------------------------------------------- SimHash near-dup #
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3


def _simhash_sign_cols(tok: DataFrame) -> DataFrame:
    """(doc_id, s0..s63) — per-bit SimHash weight sums, all JVM.

    Bit layout (both engines agree by construction): nibble j (0-based) is
    hex char j+1 of md5(term); bit position p = 4*j + k is
    ``(nibble_j >> k) & 1``; each distinct term contributes +1/-1 per bit.
    The groupBy partial-aggregates 64 small ints map-side — the shuffle
    carries one 64-int row per doc, never tokens x bits (the minhash
    lesson, applied here from the start)."""
    nibs = [
        F.conv(F.substring(F.md5("term"), j + 1, 1), 16, 10).cast("int")
        for j in range(16)
    ]
    weights = [
        (F.shiftright(nibs[p // 4], p % 4).bitwiseAND(F.lit(1)) * 2 - 1)
        for p in range(64)
    ]
    return tok.groupBy("doc_id").agg(
        *[F.sum(weights[p]).alias(f"s{p}") for p in range(64)]
    )


def _simhash_pack_cols():
    """(fingerprint, band0..band3) column expressions over s0..s63."""
    sign = [F.when(F.col(f"s{p}") > 0, F.lit(1)).otherwise(F.lit(0)) for p in range(64)]
    fp = sign[0] * F.lit(1)
    for p in range(1, 63):
        fp = fp + sign[p] * F.lit(1 << p)
    fp = fp + sign[63] * F.lit(-9223372036854775807 - 1)
    bands = []
    for i in range(SIMHASH_BANDS):
        b = sign[16 * i] * F.lit(1)
        for k in range(1, 16):
            b = b + sign[16 * i + k] * F.lit(1 << k)
        bands.append(b.cast("bigint").alias(f"band{i}"))
    return fp.cast("bigint").alias("simhash"), bands


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: bigint) — md5-nibble SimHash, oracle-reproducible.

    Unlike :func:`simhash` (blake2b, Arrow-batched Python), this variant is
    pure Catalyst and its bit derivation is expressible in ANSI SQL, so the
    driver gate can hash-match it."""
    fp, _ = _simhash_pack_cols()
    return _simhash_sign_cols(_token_sets(docs, text_col)).select("doc_id", fp)


def simhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — ALL pairs within ``max_hamming`` (<= 3).

    Scale path (Manku/Jain/Sarma-style block keys): the 64-bit fingerprint
    splits into 6 blocks (11/11/11/11/10/10 bits); candidate keys are the
    C(6, 6-k) concatenations of (6-k) blocks. Any pair within Hamming
    distance k differs in at most k blocks, so at least one (6-k)-block
    key collides — recall is COMPLETE, and the exact ``bit_count(xor)``
    verify removes false bucket hits, so the output is exactly the
    brute-force answer (which is what the DuckDB oracle computes). Keys
    are >= 32 bits wide, so random bucket collisions stay ~n^2/2^32 —
    unlike naive 16-bit banding, which goes quadratic around 10^5 docs
    (measured; that was this function's first shape).
    """
    k = int(max_hamming)
    if not 0 <= k <= 3:
        raise ValueError("max_hamming must be in [0, 3] for 6-block keys")
    import itertools

    fp, _ = _simhash_pack_cols()
    if k == 0:
        # Hamming 0 == identical fingerprints: join directly on the 64-bit
        # simhash — no block keys needed. (The 6-block C(6,6) key would pack
        # blk5 at bit 60 and overflow BIGINT under ANSI mode for blk5 >= 8.)
        sigs0 = _simhash_sign_cols(_token_sets(docs, text_col)).select("doc_id", fp)
        a0 = sigs0.select(F.col("doc_id").alias("doc_a"), "simhash")
        b0 = sigs0.select(F.col("doc_id").alias("doc_b"), "simhash")
        return (
            a0.join(b0, "simhash")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", F.lit(0).cast("bigint").alias("hamming"))
        )
    sigs = _simhash_sign_cols(_token_sets(docs, text_col)).select(
        "doc_id", fp, *_simhash_block_cols()
    )
    combos = list(itertools.combinations(range(len(SIMHASH_BLOCK_LAYOUT)), 6 - k))
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ci).cast("int").alias("combo"),
                    _pack_blocks([F.col(f"blk{b}") for b in combo]).alias("key"),
                )
                for ci, combo in enumerate(combos)
            ]
        )
    ).alias("bb")
    bucketed = sigs.select("doc_id", "simhash", entries).select(
        "doc_id", "simhash", F.col("bb.combo").alias("combo"), F.col("bb.key").alias("key")
    )
    a = bucketed.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"), "combo", "key"
    )
    b = bucketed.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"), "combo", "key"
    )
    cand = (
        a.join(b, ["combo", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("bigint")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= k)
        .select("doc_a", "doc_b", "hamming")
    )


#: 6 blocks over bit positions 0..63: (offset, width)
SIMHASH_BLOCK_LAYOUT = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]


def _simhash_block_cols():
    """blk0..blk5 column expressions over the sign sums s0..s63."""
    sign = [F.when(F.col(f"s{p}") > 0, F.lit(1)).otherwise(F.lit(0)) for p in range(64)]
    out = []
    for i, (off, width) in enumerate(SIMHASH_BLOCK_LAYOUT):
        b = sign[off] * F.lit(1)
        for k in range(1, width):
            b = b + sign[off + k] * F.lit(1 << k)
        out.append(b.cast("bigint").alias(f"blk{i}"))
    return out


def _pack_blocks(cols):
    """Concatenate block values into one bigint key (12 bits per slot)."""
    key = cols[0]
    for i, c in enumerate(cols[1:], start=1):
        key = key + c * F.lit(1 << (12 * i))
    return key.cast("bigint")


# ----------------------------------------------- duplicate clustering #
def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    node_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, cluster_rep) — connected components over a near-duplicate
    pair set; ``cluster_rep`` = min doc id of the component. The canonical
    "which duplicates to DROP" step of a training-data pipeline: keep
    exactly the rows with ``doc_id == cluster_rep``.

    Distributed min-label propagation with POINTER JUMPING: each round
    takes the min label over the node and its neighbors, then contracts
    ``label(v) <- label(label(v))`` (path halving), so convergence is
    O(log n) rounds — not graph-diameter — and each round is two hash
    joins + one aggregation. Every round ``localCheckpoint``s the label
    table (plan truncation, the round-2 lesson for iterative loops) and
    convergence is detected by the monotone non-increasing label sum (one
    tiny aggregate per round). Docs with no duplicate pair are their own
    singleton component. Cf. Kiveris et al., "Connected Components in
    MapReduce and Beyond" (the two-phase star-contraction family).
    """
    from sparkforward.score import _persistent_rdd_ids, _release_persistent_rdds

    spark = pairs.sparkSession

    def _ckpt(df):
        before = _persistent_rdd_ids(spark)
        out = df.localCheckpoint(eager=True)
        return out, _persistent_rdd_ids(spark) - before

    sym, sym_ids = _ckpt(
        pairs.select(
            F.col(id_a).cast("bigint").alias("src"),
            F.col(id_b).cast("bigint").alias("dst"),
        ).unionByName(
            pairs.select(
                F.col(id_b).cast("bigint").alias("src"),
                F.col(id_a).cast("bigint").alias("dst"),
            )
        )
    )
    # iterate ONLY over nodes that appear in a pair — near-duplicate pair
    # sets are a small fraction of a web corpus, so each round's joins are
    # O(|candidates|), not O(|corpus|); singletons attach at the end with
    # one left join (label := own id)
    labels, lab_ids = _ckpt(
        sym.select(F.col("src").alias("id")).distinct().select(
            "id", F.col("id").alias("label")
        )
    )
    converged = False
    try:
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        for _ in range(int(max_iter)):
            nbr = (
                sym.join(labels, sym.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("nbr_min"))
            )
            merged = (
                labels.join(nbr, "id", "left")
                .select("id", F.least("label", F.coalesce("nbr_min", "label")).alias("label"))
            )
            # pointer jumping: label(v) <- label(label(v))
            l2 = merged.select(F.col("id").alias("_lid"), F.col("label").alias("_llabel"))
            new_labels, new_ids = _ckpt(
                merged.join(l2, merged.label == l2._lid)
                .select("id", F.col("_llabel").alias("label"))
            )
            # the new eager checkpoint truncated its lineage: the previous
            # round's checkpoint storage releases immediately (iterative
            # operators must not accrete executor storage — the ES lesson)
            _release_persistent_rdds(spark, lab_ids)
            labels, lab_ids = new_labels, new_ids
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
        if not converged:
            # silently returning partially-merged clusters would corrupt
            # every downstream keep/drop decision — fail loudly instead
            # (pointer jumping converges in O(log n) rounds, so hitting
            # this means max_iter was set far too low for the graph)
            raise RuntimeError(
                f"connected_components did not reach the label fixpoint "
                f"within max_iter={max_iter} rounds; raise max_iter"
            )
    except BaseException:
        # a mid-loop failure (task error, OOM, cancellation) must not
        # strand checkpoint storage on a caller that catches and retries
        _release_persistent_rdds(spark, sym_ids | lab_ids)
        raise
    _release_persistent_rdds(spark, sym_ids)
    out = (
        nodes.select(F.col(node_col).cast("bigint").alias("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("cluster_rep"),
        )
    )
    # the result is backed by the final label checkpoint (its lineage is
    # truncated — it cannot be recomputed); long-lived services can free it
    # after consuming via score._release_persistent_rdds(spark, owned)
    out._sfwd_owned_rdd_ids = lab_ids
    return out


def simhash_neardup_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    """DuckDB oracle for :func:`simhash_near_duplicates`.

    Same md5-nibble fingerprint derivation; candidates by brute force
    (the oracle baseline — the engine's block-key scheme is recall-
    complete for Hamming <= 3, so both produce exactly the pairs within
    ``max_hamming``)."""
    from sparkforward.tokenize import SPLIT_PATTERN

    nib_cols = ",\n         ".join(
        f"strpos('0123456789abcdef', substr(md5(term), {j + 1}, 1)) - 1 AS n{j}"
        for j in range(16)
    )
    sums = ",\n         ".join(
        f"sum(2 * ((n{p // 4} >> {p % 4}) & 1) - 1) AS s{p}" for p in range(64)
    )
    fp_terms = " + ".join(
        [f"(CASE WHEN s{p} > 0 THEN 1 ELSE 0 END) * {1 << p}" for p in range(63)]
        + ["(CASE WHEN s63 > 0 THEN 1 ELSE 0 END) * (-9223372036854775807 - 1)"]
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, unnest(regexp_split_to_array(lower(text), '{SPLIT_PATTERN}')) AS t(term)
  WHERE t.term <> ''
),
nib AS (
  SELECT doc_id,
         {nib_cols}
  FROM tok
),
s AS (
  SELECT doc_id,
         {sums}
  FROM nib GROUP BY doc_id
),
fp AS (
  SELECT doc_id, CAST({fp_terms} AS BIGINT) AS simhash FROM s
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ------------------------------------------------- substring-level dedup #
#: Minimum duplicated run length, in tokens. Lee et al. 2022 use 50 BPE
#: tokens at production scale; the engine default is tuned to the short
#: synthetic fixtures and is always overridable.
SUBSTRING_MIN_TOKENS = 8


def substring_duplicate_spans(
    docs: DataFrame,
    min_tokens: int = SUBSTRING_MIN_TOKENS,
    text_col: str = "text",
    cross_doc_only: bool = False,
) -> DataFrame:
    """Cross-document substring-level exact dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — their
    suffix-array ExactSubstr pass, re-expressed as a Spark shuffle).

    Returns one row per **maximal duplicated token span**:
    ``(doc_id, start_tok, end_tok, span_tokens)`` with inclusive 0-based
    token positions under the engine's canonical tokenizer. A token
    position is *covered* iff some length-``min_tokens`` window
    (shingle) containing it occurs at least twice in the corpus —
    equivalently, iff it lies inside a duplicated substring of length
    >= ``min_tokens`` (any such substring is a union of duplicated
    shingles, and every duplicated shingle is such a substring). Spans
    are the maximal runs of covered positions, so overlapping and
    exactly-adjacent duplicated regions merge.

    ``cross_doc_only=True`` counts a shingle as duplicated only when it
    appears in >= 2 distinct documents (drops pure within-doc repeats).

    Spark shape (no suffix array — the classic construction does not
    distribute; this is the equi-join equivalent):

    1. per-doc shingle keys ``md5(join(tokens[p:p+L]))`` via one JVM
       ``transform`` + ``posexplode`` — O(total_tokens) rows, the
       inherent cost of substring-level dedup;
    2. duplicated keys by ``groupBy(key).count`` — partial (map-side)
       aggregation, so a boilerplate shingle in 10M docs costs one
       long-sized partial per task, not a quadratic bucket;
    3. a left-semi equi-join marks duplicated positions (AQE
       skew-handled);
    4. gaps-and-islands per doc (lag + running sum + groupBy) merges
       positions into maximal spans — windows partition by ``doc_id``,
       bounded by document length, never corpus-sized.

    md5 keys make collisions cryptographically negligible AND let the
    DuckDB oracle reproduce the grouping exactly; a 100 TB deployment
    could swap in ``xxhash64`` shingles (one long vs 32 hex chars of
    shuffle width) at the cost of a ~1e-9 birthday-collision risk per
    4B distinct shingles.
    """
    from pyspark.sql.window import Window

    L = int(min_tokens)
    if L < 2:
        raise ValueError(f"min_tokens must be >= 2, got {min_tokens}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), SPLIT_PATTERN), lambda t: t != ""
    )
    src = docs.select("doc_id", toks.alias("_ts")).filter(F.size("_ts") >= L)
    shingles = F.transform(
        F.sequence(F.lit(0), F.size("_ts") - L),
        lambda p: F.md5(F.concat_ws(" ", F.slice("_ts", p + 1, L))),
    )
    keys = src.select(
        "doc_id", F.posexplode(shingles).alias("_p", "_k")
    ).select("doc_id", F.col("_p").cast("long").alias("p"), F.col("_k").alias("k"))
    if cross_doc_only:
        dup = (
            keys.groupBy("k")
            .agg(F.countDistinct("doc_id").alias("c"))
            .filter(F.col("c") >= 2)
        )
    else:
        dup = keys.groupBy("k").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    marked = keys.join(dup.select("k"), "k", "leftsemi")
    w = Window.partitionBy("doc_id").orderBy("p")
    # coverage of position p is [p, p+L-1]; two duplicated positions
    # merge iff the later one starts within (or immediately after) the
    # earlier one's coverage: p_cur <= p_prev + L
    brk = (
        F.when(F.col("p") - F.lag("p").over(w) <= L, F.lit(0))
        .otherwise(F.lit(1))
        .alias("brk")
    )
    isl = marked.select("doc_id", "p", brk).withColumn(
        "run_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("doc_id", "run_id")
        .agg(
            F.min("p").alias("start_tok"),
            (F.max("p") + F.lit(L - 1)).alias("end_tok"),
            (F.max("p") - F.min("p") + F.lit(L)).alias("span_tokens"),
        )
        .select("doc_id", "start_tok", "end_tok", "span_tokens")
    )


def apply_span_removals(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Remove duplicated token spans from each document.

    ``spans`` is :func:`substring_duplicate_spans` output (or any
    ``(doc_id, start_tok, end_tok)`` interval set). Returns
    ``(doc_id, text, n_tokens_kept, n_tokens_removed)`` where ``text``
    is the surviving tokens rejoined with single spaces — the engine
    dedups at its canonical token granularity, so original whitespace/
    punctuation inside removed regions is not reconstructed (Lee et al.
    operate on bytes; our unit is the token stream the index consumes).

    Shape: spans aggregate to one interval array per doc (bounded by
    doc length), broadcast-friendly equi-join back to the corpus, and a
    JVM ``filter`` keeps tokens outside every interval — no Python, no
    shuffle beyond the one groupBy.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), SPLIT_PATTERN), lambda t: t != ""
    )
    iv = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_iv")
    )
    src = docs.select("doc_id", toks.alias("_ts")).join(iv, "doc_id", "left")
    empty_iv = F.array().cast("array<struct<start_tok:bigint,end_tok:bigint>>")
    src = src.withColumn("_iv", F.coalesce(F.col("_iv"), empty_iv))
    kept = F.filter(
        F.transform(F.col("_ts"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_iv"),
            lambda v: (s["i"] >= v["start_tok"]) & (s["i"] <= v["end_tok"]),
        ),
    )
    return src.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("text"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        (F.size("_ts") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


def substring_oracle_sql(source: str = "documents", min_tokens: int = SUBSTRING_MIN_TOKENS) -> str:
    """DuckDB twin of :func:`substring_duplicate_spans` (global scope) over
    ``source`` (a table name or parenthesized subquery with doc_id, text).

    Brute-force construction: every shingle position is materialized with
    ``unnest(range(...))``, duplicated keys found by the same md5 grouping,
    and spans by the identical gaps-and-islands (lag + running sum). All
    output columns CAST AS BIGINT (DuckDB min/max over range() values stay
    BIGINT, but the cast pins the typed hash either way).
    """
    L = int(min_tokens)
    return f"""
WITH {_substring_span_ctes(source, L)}
SELECT doc_id,
       CAST(min(p) AS BIGINT) AS start_tok,
       CAST(max(p) + {L - 1} AS BIGINT) AS end_tok,
       CAST(max(p) - min(p) + {L} AS BIGINT) AS span_tokens
FROM isl GROUP BY doc_id, run_id
"""


def _substring_span_ctes(source: str, L: int) -> str:
    """The shared CTE chain (tokenize -> shingle -> dup keys ->
    gaps-and-islands) both substring oracles build on."""
    return f"""tok AS (
  SELECT doc_id, list_filter(
    regexp_split_to_array(lower(text), '{SPLIT_PATTERN}'), t -> t <> '') AS ts
  FROM {source} AS _sub_src
),
pos0 AS (
  SELECT doc_id, ts, unnest(range(0, greatest(len(ts) - {L} + 1, 0))) AS p
  FROM tok
),
pos AS (
  SELECT doc_id, p, md5(array_to_string(ts[p+1 : p+{L}], ' ')) AS k FROM pos0
),
dupk AS (SELECT k FROM pos GROUP BY k HAVING count(*) >= 2),
dp AS (SELECT doc_id, p FROM pos WHERE k IN (SELECT k FROM dupk)),
br AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= {L}
              THEN 0 ELSE 1 END AS brk
  FROM dp
),
isl AS (
  SELECT doc_id, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM br
)"""


def substring_apply_oracle_sql(
    source: str = "documents", min_tokens: int = SUBSTRING_MIN_TOKENS
) -> str:
    """DuckDB twin of :func:`substring_duplicate_spans` +
    :func:`apply_span_removals` composed: the cleaned corpus.

    Reuses the span CTE chain, marks every covered token position, and
    string_agg-rebuilds the surviving tokens in order (single-space
    joined, exactly the engine's canonical token-stream output). Docs
    with no surviving token — or no tokens at all — keep a row with
    empty text, mirroring the Spark side's left join."""
    L = int(min_tokens)
    return f"""
WITH {_substring_span_ctes(source, L)},
spans AS (
  SELECT doc_id, min(p) AS start_tok, max(p) + {L - 1} AS end_tok
  FROM isl GROUP BY doc_id, run_id
),
tpos AS (
  SELECT doc_id, CAST(r.i AS BIGINT) AS i, ts[CAST(r.i AS BIGINT) + 1] AS t
  FROM tok, unnest(range(0, len(ts))) AS r(i)
),
keep AS (
  SELECT tp.doc_id, tp.i, tp.t
  FROM tpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = tp.doc_id AND tp.i BETWEEN s.start_tok AND s.end_tok
  )
),
agg AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text,
         count(*) AS nk
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.text, '') AS text,
       CAST(coalesce(a.nk, 0) AS BIGINT) AS n_tokens_kept,
       CAST(len(d.ts) - coalesce(a.nk, 0) AS BIGINT) AS n_tokens_removed
FROM tok d LEFT JOIN agg a USING (doc_id)
"""
