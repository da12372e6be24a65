"""Training-data curation plans: the operations a large-scale LLM
pretraining pipeline runs AFTER filtering/dedup — sequence packing,
mixture weighting, provenance reporting, containment analysis, BPE-style
pretokenization, and embedding quantization.

All queries follow the repo's cross-engine discipline (see
plans/base.py): exact integer arithmetic wherever a float could hit a
rounding tie, md5 as the only hash, every column aliased identically in
the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import TOKEN_SPLIT_RE
from .base import QuerySpec, t, vec_finite_sql, vecs

# ------------------------------------------------------------ sequence packing
# Greedy sequential packing of documents into fixed-size token bins
# (the pretraining context-window packing step). Deterministic: docs are
# packed in doc_id order within each language stream; a doc starts the
# next bin when its START offset crosses the bin boundary. At 100 TB the
# window is per (lang) stream — repartition by lang, sort within
# partitions by doc_id, and the cumulative sum never shuffles again.

_PACK_BIN_TOKENS = 512


_PACK_SHARD_DOCS = 100  # doc_id-range shard width for the parallel prefix sum


def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack docs into 512-token bins per language (greedy, doc_id
    order); report docs and token mass per bin. Pure integer arithmetic
    — exact in both engines.

    The cumulative sum is the DISTRIBUTED two-pass prefix sum, not one
    window partition per language (which would serialize each language
    stream through a single task at 100 TB): pass 1 computes within-
    shard running sums in parallel across (lang, doc_id-range) shards;
    pass 2 computes each shard's starting offset from the tiny per-shard
    totals table; the global cumsum is their sum. Identical values to
    the naive single-window form, shuffle-parallel at any scale."""
    d = t(spark, sf_dir, "documents", fanout=True)
    n_tok = F.size(F.split(F.trim("text"), TOKEN_SPLIT_RE)).cast("long")
    docs = d.select(
        "doc_id", "lang", n_tok.alias("n_tok"),
        F.expr(f"doc_id div {_PACK_SHARD_DOCS}").alias("shard"))
    w_in = Window.partitionBy("lang", "shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    within = docs.withColumn("cum_in_shard", F.sum("n_tok").over(w_in))
    shard_tot = docs.groupBy("lang", "shard").agg(F.sum("n_tok").alias("shard_tok"))
    w_off = Window.partitionBy("lang").orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "lang", "shard",
        F.coalesce(F.sum("shard_tok").over(w_off), F.lit(0)).alias("offset"))
    # eqNullSafe on the nullable lang key (r16 null-census class C): a
    # bare equi-join silently dropped every null-lang doc from packing
    # (the oracle's window PARTITION BY lang keeps the NULL partition).
    # shard is non-null by construction (doc_id div N).
    offs = offsets.select(F.col("lang").alias("o_lang"),
                          F.col("shard").alias("o_shard"), "offset")
    packed = (
        within.join(offs, F.col("lang").eqNullSafe(F.col("o_lang"))
                    & (F.col("shard") == F.col("o_shard")))
        .withColumn("cum", F.col("cum_in_shard") + F.col("offset"))
        .withColumn("bin", F.expr(f"(cum - n_tok) div {_PACK_BIN_TOKENS}"))
    )
    return (
        packed.groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("bin_tokens"))
        .orderBy("lang", "bin")
    )


SEQUENCE_PACKING_SQL = rf"""
WITH docs AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))::BIGINT AS n_tok
  FROM documents
),
c AS (
  SELECT lang, n_tok,
         (SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
  FROM docs
)
SELECT lang, ((cum - n_tok) // {_PACK_BIN_TOKENS})::BIGINT AS bin,
       COUNT(*) AS n_docs, SUM(n_tok)::BIGINT AS bin_tokens
FROM c
GROUP BY 1, 2
ORDER BY lang, bin
"""

# ------------------------------------------------------------ mixture weights
# Temperature-scaled sampling weights per language stream (the
# multilingual mixture recipe: w_l ∝ n_l^α with α=1/2 flattens the
# head). One tiny agg + a broadcast scalar join — the 100 TB cost is one
# pass over token counts.


def mixture_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), TOKEN_SPLIT_RE)).cast("long")
    per = d.select("lang", n_tok.alias("n_tok")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"))
    z = per.agg(F.sum(F.sqrt(F.col("n_tokens"))).alias("z"))
    return (
        per.crossJoin(broadcast(z))
        .select("lang", "n_docs", "n_tokens",
                F.round(F.sqrt(F.col("n_tokens")) / F.col("z"), 6).alias("weight"))
        .orderBy("lang")
    )


MIXTURE_WEIGHTS_SQL = r"""
WITH per AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))::BIGINT)::BIGINT AS n_tokens
  FROM documents
  GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       ROUND(sqrt(n_tokens) / (SELECT SUM(sqrt(n_tokens)) FROM per), 6) AS weight
FROM per
ORDER BY lang
"""

# ------------------------------------------------------------ provenance report
# Per-source corpus report: volume, token mass, language spread, mean
# quality. The average stays in exact 1e-4 integer units end-to-end
# (float averages are NOT cross-engine portable — see the float
# discipline in plans/base.py).


def source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _quality_score_expr
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), TOKEN_SPLIT_RE)).cast("long")
    q_e4 = F.round(_quality_score_expr() * 10000).cast("long")
    per_doc = d.select("source", "lang", n_tok.alias("n_tok"), q_e4.alias("q_e4"))
    return (
        per_doc.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"),
             F.countDistinct("lang").alias("n_langs"),
             F.sum("q_e4").alias("q_sum_e4"))
        .select("source", "n_docs", "n_tokens", "n_langs",
                (F.expr("(q_sum_e4 * 100) div n_docs") / 1000000.0).alias("avg_quality"))
        .orderBy("source")
    )


SOURCE_MIX_SQL = r"""
WITH per_doc AS (
  SELECT source, lang,
         len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))::BIGINT AS n_tok,
         CAST(ROUND((
             (CASE WHEN len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+')) >= 20
                   THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN length(text) / len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))
                   BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
           + LEAST(ROUND(len(list_filter(regexp_split_to_array(trim(lower(text), ' '), '[ \t\n\x0b\f\r]+'),
                   x -> x IN ('the','a','of','and','to','in','is')))
                   / len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+')), 4), 0.3)
         ) * 10000) AS BIGINT) AS q_e4
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, SUM(n_tok)::BIGINT AS n_tokens,
       COUNT(DISTINCT lang) AS n_langs,
       ((SUM(q_e4)::BIGINT * 100) // COUNT(*)) / 1000000.0 AS avg_quality
FROM per_doc
GROUP BY source
ORDER BY source
"""

# ------------------------------------------------------------ containment
# Directional containment |A∩B|/|A| over the verified near-dup pairs —
# distinguishes symmetric near-dups from quote/subset inclusion (the
# signal Jaccard alone hides: a doc fully contained in a bigger one has
# high containment but modest Jaccard). Reuses the memoized AllPairs
# output and the shared shingle index; zero new heavy joins.


def near_dup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _shingle_sets, dedup_ngram_jaccard
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b", "n_common")
    _, sets = _shingle_sets(spark, sf_dir, 3)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_common") / F.col("n_sh_a"), 4).alias("containment_a"),
            F.round(F.col("n_common") / F.col("n_sh_b"), 4).alias("containment_b"),
            F.round(F.col("n_common")
                    / F.least("n_sh_a", "n_sh_b"), 4).alias("max_containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _containment_sql() -> str:
    from .text import DEDUP_JACCARD_SQL
    return rf"""
WITH pairs AS ({DEDUP_JACCARD_SQL.strip()}),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           array_to_string(toks[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0b\f\r]+') AS toks
          FROM documents),
         UNNEST(range(1, len(toks) - 1)) AS u(i)
    WHERE len(toks) >= 3
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
SELECT doc_a, doc_b,
       ROUND(n_common / sa.n_sh, 4) AS containment_a,
       ROUND(n_common / sb.n_sh, 4) AS containment_b,
       ROUND(n_common / LEAST(sa.n_sh, sb.n_sh), 4) AS max_containment
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
ORDER BY doc_a, doc_b
"""

# ------------------------------------------------------------ BPE pretokenize
# The GPT-2-family pretokenizer split (contractions / letter runs /
# digit runs / punctuation runs, each optionally space-prefixed),
# restricted to lookahead-free constructs so Java regex (Spark) and RE2
# (DuckDB) agree. Token counting at this granularity is the first step
# of every BPE training/accounting pass.

# whitespace spelled out, not \s (r17): this one pattern string is
# shared VERBATIM by Spark (Java regex) and the oracle (RE2), and the
# dialects disagree on \s — Java includes \x0B (vertical tab), RE2
# does not — so an interior \v would land inside an RE2 punct run but
# break a Java one. The explicit class means the same set in both.
_BPE_PRETOKEN_RE = (r"(?:'s|'t|'re|'ve|'m|'ll|'d)"
                    r"| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0b\f\r\p{L}\p{N}]+")
_BPE_TOP_K = 50


def bpe_pretokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents", fanout=True)
    tok = F.explode(
        F.regexp_extract_all("text", F.lit(_BPE_PRETOKEN_RE), F.lit(0))).alias("token")
    counts = d.select(tok).groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no global shuffle), then rank the tiny k-row result; a
    # global row_number window over all tokens would single-partition
    # the full vocabulary at scale
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(_BPE_TOP_K)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("rk", "token", "n")
        .orderBy("rk")
    )


_BPE_SQL_RE = _BPE_PRETOKEN_RE.replace("'", "''")
BPE_PRETOKENIZE_SQL = f"""
WITH toks AS (
  SELECT UNNEST(regexp_extract_all(text, '{_BPE_SQL_RE}')) AS token
  FROM documents
),
counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
ranked AS (
  SELECT token, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rk
  FROM counts
)
SELECT CAST(rk AS INT) AS rk, token, n
FROM ranked
WHERE rk <= {_BPE_TOP_K}
ORDER BY rk
"""

# ------------------------------------------------------------ quantization
# Scalar (int8) quantization of the embedding column — the storage/
# serving compression step of a vector index (per-dimension min/max
# scaling, the SQ8 scheme). Verification stays EXACT-integer: the query
# outputs per-vector code checksums, not float reconstruction error —
# floor() on identical IEEE expressions is bit-identical across engines,
# so the int codes are too. At scale the dim-stats pass is one tiny agg
# broadcast to the encode pass.


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = vecs(spark, sf_dir).select("vec_id", "embedding")
    stats = (
        e.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    arrs = stats.agg(
        F.expr("transform(array_sort(collect_list(struct(i, mn, mx))), s -> s.mn)")
        .alias("mins"),
        F.expr("transform(array_sort(collect_list(struct(i, mn, mx))), s -> s.mx)")
        .alias("maxs"),
    )
    # Degenerate (constant) dimension guard: maxs[i] == mins[i] would
    # divide by zero — Spark yields NaN→NULL silently while DuckDB's
    # CAST raises, a latent cross-engine divergence (ADVICE r3). Both
    # engines map a constant dimension to code 0 explicitly.
    # arithmetic in DOUBLE end to end (r16 10x-sweep find): x and the
    # collected mins/maxs are FLOAT, and Spark's float-float
    # subtraction stays float32 while the oracle widens to DOUBLE[]
    # first — at 1.5M codes (10x fixture) two rows landed on a floor
    # boundary one float32-ulp apart. Widening casts are exact, so
    # both engines now run the identical double computation.
    codes = F.expr(
        "transform(embedding, (x, i) -> if(maxs[i] = mins[i], 0, "
        "cast(floor((cast(x as double) - cast(mins[i] as double)) "
        "/ (cast(maxs[i] as double) - cast(mins[i] as double)) "
        "* 255.0) as int)))")
    return (
        e.crossJoin(broadcast(arrs))
        .select("vec_id", codes.alias("codes"))
        .select(
            "vec_id",
            F.expr("aggregate(codes, cast(0 as bigint), (a, c) -> a + c)")
            .alias("code_sum"),
            F.array_min("codes").alias("code_min"),
            F.array_max("codes").alias("code_max"),
            F.element_at("codes", 1).alias("first_code"),
        )
        .orderBy("vec_id")
    )


EMBEDDING_QUANT_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
           WHERE {vec_finite_sql()}),
dims AS (
  SELECT i, MIN(emb[i + 1]) AS mn, MAX(emb[i + 1]) AS mx
  FROM e, UNNEST(range(64)) AS u(i)
  GROUP BY i
),
bounds AS (
  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM dims
),
coded AS (
  SELECT vec_id,
         list_transform(range(64), i ->
           CASE WHEN maxs[i + 1] = mins[i + 1] THEN 0
                ELSE CAST(floor((emb[i + 1] - mins[i + 1])
                               / (maxs[i + 1] - mins[i + 1]) * 255.0) AS INT)
           END) AS codes
  FROM e CROSS JOIN bounds
)
SELECT vec_id,
       list_sum(codes)::BIGINT AS code_sum,
       list_min(codes) AS code_min,
       list_max(codes) AS code_max,
       codes[1] AS first_code,
FROM coded
ORDER BY vec_id
"""


CONTAINMENT_SQL = _containment_sql()

SPECS: list[QuerySpec] = [
    QuerySpec("sequence_packing_bins", sequence_packing_bins, SEQUENCE_PACKING_SQL,
              "greedy context-window packing into 512-token bins per language"),
    QuerySpec("mixture_sampling_weights", mixture_sampling_weights, MIXTURE_WEIGHTS_SQL,
              "temperature-scaled (α=1/2) language mixture weights"),
    QuerySpec("source_mix_report", source_mix_report, SOURCE_MIX_SQL,
              "per-source provenance report (volume, tokens, languages, mean quality)"),
    QuerySpec("near_dup_containment", near_dup_containment, CONTAINMENT_SQL,
              "directional containment over verified near-dup pairs"),
    QuerySpec("bpe_pretokenize_counts", bpe_pretokenize_counts, BPE_PRETOKENIZE_SQL,
              "GPT-2-style pretokenizer top-k token counts (lookahead-free regex)"),
    QuerySpec("embedding_quantization", embedding_quantization, EMBEDDING_QUANT_SQL,
              "int8 scalar quantization of embeddings with exact-integer checksums"),
]

# ------------------------------------------------------------ survivor selection
# Quality-weighted dedup survivor: instead of "keep min doc_id" per
# near-dup cluster, keep the HIGHEST-quality member (ties by doc_id) —
# the survivor policy real curation runs use. Composes the converged
# connected-components labels (memoized) with the fused quality signal;
# one rank window over clusters.


def cluster_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _quality_score_expr, dedup_connected_components
    comp = dedup_connected_components(spark, sf_dir).select("doc_id", "component")
    d = t(spark, sf_dir, "documents", fanout=True)
    qual = d.select(
        "doc_id",
        F.round(_quality_score_expr() * 10000).cast("long").alias("q_e4"))
    w = Window.partitionBy("component").orderBy(
        F.col("q_e4").desc(), F.col("doc_id").asc())
    # cluster_size rides the SAME component partitioning the rank
    # window already shuffles for — the former groupBy+join back onto
    # the (memoized) component relation paid an extra exchange+join for
    # a count the window gets free (tools/audit_plan_scans.py).
    ranked = (comp.join(qual, "doc_id")
              .withColumn("rk", F.row_number().over(w))
              .withColumn("cluster_size",
                          F.count(F.lit(1)).over(
                              Window.partitionBy("component"))))
    return (
        ranked.filter(F.col("rk") == 1)
        .filter(F.col("cluster_size") > 1)  # singletons are trivially their own survivor
        .select("component",
                F.col("doc_id").alias("survivor_doc_id"),
                "cluster_size",
                (F.col("q_e4") / 10000.0).alias("best_quality"))
        .orderBy("component")
    )


def _survivor_sql() -> str:
    from .text import COMPONENTS_SQL
    quality_e4 = """
  SELECT doc_id,
         CAST(ROUND((
             (CASE WHEN len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+')) >= 20
                   THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN length(text) / len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+'))
                   BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
           + LEAST(ROUND(len(list_filter(regexp_split_to_array(trim(lower(text), ' '), '[ \\t\\n\\x0b\\f\\r]+'),
                   x -> x IN ('the','a','of','and','to','in','is')))
                   / len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+')), 4), 0.3)
         ) * 10000) AS BIGINT) AS q_e4
  FROM documents
"""
    return f"""
WITH comp AS ({COMPONENTS_SQL.strip()}),
qual AS ({quality_e4}),
ranked AS (
  SELECT comp.component, comp.doc_id, qual.q_e4,
         ROW_NUMBER() OVER (PARTITION BY comp.component
                            ORDER BY qual.q_e4 DESC, comp.doc_id ASC) AS rk
  FROM comp JOIN qual ON comp.doc_id = qual.doc_id
),
sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
SELECT r.component, r.doc_id AS survivor_doc_id, s.cluster_size,
       r.q_e4 / 10000.0 AS best_quality
FROM ranked r JOIN sizes s ON r.component = s.component
WHERE r.rk = 1 AND s.cluster_size > 1
ORDER BY r.component
"""


# ------------------------------------------------------------ budget selection
# Data selection under a token budget: per language, take documents in
# quality-rank order until the budget fills — the "what do we actually
# train on" decision. Exact integer cumsum; the per-lang window uses the
# same two-pass shard pattern as sequence_packing_bins at scale (5
# language streams here, so the direct window is fine at fixture size —
# the scalable form is demonstrated there).

_SELECT_BUDGET_TOKENS = 5000


def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _quality_score_expr
    d = t(spark, sf_dir, "documents", fanout=True)
    n_tok = F.size(F.split(F.trim("text"), TOKEN_SPLIT_RE)).cast("long")
    per_doc = d.select(
        "lang", "doc_id", n_tok.alias("n_tok"),
        F.round(_quality_score_expr() * 10000).cast("long").alias("q_e4"))
    w = Window.partitionBy("lang").orderBy(
        F.col("q_e4").desc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    ranked = per_doc.withColumn("cum_tok", F.sum("n_tok").over(w))
    selected = ranked.filter(
        F.col("cum_tok") - F.col("n_tok") < _SELECT_BUDGET_TOKENS)
    return (
        selected.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_selected"),
             F.sum("n_tok").alias("tokens_selected"),
             (F.min("q_e4") / 10000.0).alias("min_quality_selected"))
        .orderBy("lang")
    )


TOKEN_BUDGET_SQL = rf"""
WITH per_doc AS (
  SELECT lang, doc_id,
         len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))::BIGINT AS n_tok,
         CAST(ROUND((
             (CASE WHEN len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+')) >= 20
                   THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN length(text) / len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))
                   BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
           + LEAST(ROUND(len(list_filter(regexp_split_to_array(trim(lower(text), ' '), '[ \t\n\x0b\f\r]+'),
                   x -> x IN ('the','a','of','and','to','in','is')))
                   / len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+')), 4), 0.3)
         ) * 10000) AS BIGINT) AS q_e4
  FROM documents
),
ranked AS (
  SELECT *, (SUM(n_tok) OVER (PARTITION BY lang ORDER BY q_e4 DESC, doc_id ASC
                              ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tok
  FROM per_doc
)
SELECT lang, COUNT(*) AS n_docs_selected, SUM(n_tok)::BIGINT AS tokens_selected,
       MIN(q_e4) / 10000.0 AS min_quality_selected
FROM ranked
WHERE cum_tok - n_tok < {_SELECT_BUDGET_TOKENS}
GROUP BY lang
ORDER BY lang
"""


SURVIVOR_SQL = _survivor_sql()

SPECS.extend([
    QuerySpec("cluster_best_survivor", cluster_best_survivor, SURVIVOR_SQL,
              "quality-weighted near-dup survivor selection per cluster"),
    QuerySpec("token_budget_selection", token_budget_selection, TOKEN_BUDGET_SQL,
              "per-language quality-ranked selection under a token budget"),
])

# ------------------------------------------------------------ weighted sampling
# Closing the mixture loop: APPLY the temperature weights as a
# deterministic hash-threshold sample — doc kept iff
# md5(doc_id) mod 1e6 < floor(rate · 1e6), where the per-language rate
# rescales the α=1/2 weights so the most-upweighted language keeps 100%
# (standard up/down-sampling normalization). Pure function of the data:
# identical sample on every run, engine, and cluster size — unlike
# Bernoulli TABLESAMPLE, which is seed- and partitioning-dependent.

def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), TOKEN_SPLIT_RE)).cast("long")
    per = d.select("lang", n_tok.alias("n_tok")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"))
    # rate_l = (n_l^α / n_tokens_l) normalized so max_l rate = 1:
    # sampling docs at rate ∝ weight/share equalizes toward the mixture
    raw = per.select(
        "lang", (F.sqrt(F.col("n_tokens")) / F.col("n_tokens")).alias("raw_rate"))
    # zmax as a window-max over the ~|langs|-row aggregate — the former
    # agg+crossJoin referenced the raw subtree twice, re-running the
    # corpus stats scan for a scalar (tools/audit_plan_scans.py). The
    # constant partition key is fine: the window input is one row per
    # language, never the fact table.
    rates = (
        raw.withColumn("zmax",
                       F.max("raw_rate").over(Window.partitionBy(F.lit(1))))
        .select("lang",
                F.floor(F.col("raw_rate") / F.col("zmax") * 1000000)
                .cast("long").alias("rate_ppm"))
    )
    keep = (
        d.select("doc_id", "lang", n_tok.alias("n_tok"))
        .join(broadcast(rates), "lang")
        .filter(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000000 < F.col("rate_ppm"))
    )
    return (
        keep.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept_docs"),
             F.sum("n_tok").alias("kept_tokens"))
        .orderBy("lang")
    )


MIXTURE_SAMPLE_SQL = r"""
WITH per AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))::BIGINT)::BIGINT AS n_tokens
  FROM documents
  GROUP BY lang
),
raw AS (SELECT lang, sqrt(n_tokens) / n_tokens AS raw_rate FROM per),
rates AS (
  SELECT lang,
         CAST(FLOOR(raw_rate / (SELECT MAX(raw_rate) FROM raw) * 1000000) AS BIGINT)
           AS rate_ppm
  FROM raw
),
keep AS (
  SELECT d.lang,
         len(regexp_split_to_array(trim(d.text, ' '), '[ \t\n\x0b\f\r]+'))::BIGINT AS n_tok
  FROM documents d
  JOIN rates USING (lang)
  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 < rate_ppm
)
SELECT lang, COUNT(*) AS kept_docs, SUM(n_tok)::BIGINT AS kept_tokens
FROM keep
GROUP BY lang
ORDER BY lang
"""

SPECS.append(
    QuerySpec("mixture_weighted_sample", mixture_weighted_sample, MIXTURE_SAMPLE_SQL,
              "deterministic hash-threshold sampling at temperature-mixture rates"))

# ------------------------------------------------------------ train/val/test split
# Deterministic hash-based split assignment — the reproducibility
# primitive every training pipeline needs: membership is a pure
# function of the stable key (doc_id:source), so re-runs, incremental
# ingest, and different engines all agree on which split a document
# lands in (no stored split table, no RNG seed to lose). Buckets come
# from the first 8 hex chars of md5 mod 1000: <900 train, <950 val,
# else test (~90/5/5). Scale: a map-side expression plus ONE hash-agg
# shuffle on (source, split) — nothing else; at 100 TB the split column
# is typically materialized at ingest and this report is a free rollup.


def hash_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":"), F.col("source"))), 1, 8), 16, 10)
        .cast("long") % 1000)
    split = (F.when(bucket < 900, "train")
             .when(bucket < 950, "val")
             .otherwise("test"))
    return (
        d.select("source", split.alias("split"),
                 F.col("n_chars").alias("nc"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("nc").alias("total_chars"))
        .orderBy("source", "split")
    )


HASH_SPLIT_SQL = """
WITH assigned AS (
  SELECT source,
         CASE WHEN b < 900 THEN 'train'
              WHEN b < 950 THEN 'val'
              ELSE 'test' END AS split,
         n_chars
  FROM (
    SELECT source, n_chars,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8))::BIGINT
             % 1000 AS b
    FROM documents
  )
)
SELECT source, split, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS total_chars
FROM assigned
GROUP BY source, split
ORDER BY source, split
"""

SPECS.append(
    QuerySpec("hash_split_assignment", hash_split_assignment, HASH_SPLIT_SQL,
              "deterministic md5-bucket train/val/test split report (~90/5/5)"))


# ------------------------------------------------------ per-domain frequency cap
# Common Crawl-style per-domain document cap: within each (source, lang)
# keep at most CAP docs, chosen by a deterministic content-independent
# hash order (md5 of doc_id) so re-runs, incremental ingests, and
# different engines agree on the SAME survivors without coordination —
# the same determinism argument as hash_split_assignment above. The
# fixture's (source, lang) cardinality (~100) is the degenerate case; in
# production the partition key is (domain, lang) at 1e7+ cardinality, so
# the rank window's hash shuffle is well spread — and the cap itself is
# what bounds any one domain's contribution to the corpus, which is why
# the op exists. One pruned 4-column scan, one hash shuffle.

_DOMAIN_CAP = 8


def source_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select(
        "source", "lang", "n_chars",
        F.row_number().over(w).alias("rn"))
    kept = F.col("rn") <= _DOMAIN_CAP
    return (
        ranked.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
             F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
             .alias("kept_chars"))
        .withColumn("n_dropped", F.col("n_docs") - F.col("n_kept"))
        .select("source", "lang", "n_docs", "n_kept", "n_dropped",
                "kept_chars")
        .orderBy("source", "lang")
    )


SOURCE_CAP_SQL = f"""
WITH ranked AS (
  SELECT source, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source, lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       (COUNT(*)
        - SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END))::BIGINT
         AS n_dropped,
       SUM(CASE WHEN rn <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END)::BIGINT
         AS kept_chars
FROM ranked
GROUP BY source, lang
ORDER BY source, lang
"""

SPECS.append(
    QuerySpec("source_frequency_cap", source_frequency_cap, SOURCE_CAP_SQL,
              "per-(source,lang) doc cap with deterministic hash-order survivors"))


# --------------------------------------------- source dup/quality audit
# Per-source duplication rate × mean quality — the curation dashboard
# row that decides which sources get downweighted before mixing (a
# source that is 40 % duplicated AND low-quality is the first cut).
# Reuses the exact-dedup content key (md5 of normalized text —
# plans/text.py dedup_exact_documents) and the shared C4-style quality
# expression (_quality_score_expr), so the report is consistent with
# both upstream operators. Quality stays in exact 1e-4 integer units
# (round(score·1e4) of the 4-dp-rounded score is integer-exact; a
# double MEAN would tie-break differently across engines); dup share is
# exact pure-BIGINT e6. Scale shape: one scan → one hash-window
# exchange on content_hash → per-source aggregate (|sources| rows).


def source_dup_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _quality_score_expr
    from .warehouse import _share_e6_expr
    d = t(spark, sf_dir, "documents")
    marked = (
        d.select("source",
                 F.md5(F.lower(F.trim("text"))).alias("_h"),
                 F.round(_quality_score_expr() * 10000).cast("long")
                 .alias("_q_e4"))
        .withColumn("_copies", F.count(F.lit(1)).over(
            Window.partitionBy("_h")))
    )
    return (
        marked.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.when(F.col("_copies") > 1, 1).otherwise(0))
             .alias("n_duped"),
             F.sum("_q_e4").alias("_qsum_e4"))
        .select("source", "n_docs", "n_duped",
                F.expr(_share_e6_expr("n_duped", "n_docs"))
                .alias("dup_share_e6"),
                F.expr("_qsum_e4 div n_docs").alias("mean_quality_e4"))
        .orderBy("source")
    )


SOURCE_AUDIT_SQL = r"""
WITH base AS (
  SELECT source,
         md5(lower(trim(text, ' '))) AS h,
         CAST(ROUND(ROUND(
             (CASE WHEN len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+')) >= 20
                   THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN length(text)
                        / len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'))
                   BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
           + LEAST(ROUND(
                 len(list_filter(
                       regexp_split_to_array(trim(lower(text), ' '), '[ \t\n\x0b\f\r]+'),
                       x -> x IN ('the','a','of','and','to','in','is')))
                 / len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+')), 4),
               0.3), 4) * 10000) AS BIGINT) AS q_e4
  FROM documents
),
marked AS (
  SELECT source, q_e4,
         COUNT(*) OVER (PARTITION BY h) AS copies
  FROM base
),
per AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END)::BIGINT AS n_duped,
         SUM(q_e4)::BIGINT AS qsum_e4
  FROM marked GROUP BY source
)
SELECT source, n_docs, n_duped,
       ((n_duped * 1000 // n_docs) * 1000
        + ((n_duped * 1000 % n_docs) * 1000) // n_docs)::BIGINT
         AS dup_share_e6,
       (qsum_e4 // n_docs)::BIGINT AS mean_quality_e4
FROM per
ORDER BY source
"""

SPECS.append(
    QuerySpec("source_dup_quality_audit", source_dup_quality_audit,
              SOURCE_AUDIT_SQL,
              "per-source duplication rate x mean quality (exact e6/e4)"))
