"""Prefix suggestions + SymSpell-style spell correction over the index
term dictionary.

The reference exposes free-text search only (`routers/search.py`); a
did-you-mean / autocomplete surface is the standard companion feature of
a web search engine and falls out of the `term_stats(term, df, ctf, idf)`
table the index already maintains (`index/segments.py` finalize step).
Both operators are public algorithms:

- Prefix suggestion = ordered dictionary scan (any search engine's
  autocomplete); here a pushed-down `StartsWith` filter on the
  term_stats parquet (term-sorted files -> row-group min/max pruning)
  ranked by document frequency.
- Spell correction = SymSpell (Garbe, 2012, MIT-licensed public
  algorithm): index every dictionary term under its deletion
  neighborhood (all strings reachable by deleting <= e chars), look a
  query term up under ITS deletion neighborhood, and verify candidates
  with true edit distance. If lev(a, b) <= e then a and b share at
  least one key in their depth-e delete neighborhoods, so the candidate
  set is exact (no recall loss) while the join touches only
  O(len^e) keys per term instead of the whole dictionary.

Scale shape: the deletes table is |dict| * O(len^e) rows built with
JVM-side higher-order functions (no Python), shuffled once at build
time; query-side lookups broadcast a few-hundred-row key table against
it, verify with the built-in `levenshtein`, and rank with one window.
Nothing is quadratic in the dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# depth-1 deletion neighborhood of `term` (array<string>), JVM-side:
# element i = term with char i+1 removed (substring is 1-based).
_DEL1 = (
    "transform(sequence(0, length({c}) - 1),"
    " i -> concat(substring({c}, 1, i), substring({c}, i + 2)))"
)


def _neighborhood_col(col_name: str, max_edit: int):
    """array<string> column: the distinct deletion neighborhood of
    `col_name` up to depth `max_edit`, INCLUDING the term itself
    (depth 0). Pure Catalyst HOFs — stays in whole-stage codegen."""
    if max_edit not in (1, 2):
        raise ValueError("max_edit must be 1 or 2")
    d1 = _DEL1.format(c=col_name)
    expr = f"array_union(array({col_name}), {d1})"
    if max_edit == 2:
        d2 = "flatten(transform(" + d1 + ", d -> " + _DEL1.format(c="d") + "))"
        expr = f"array_union({expr}, {d2})"
    return F.array_distinct(F.expr(expr))


def py_deletes(term: str, max_edit: int) -> set[str]:
    """Driver-side mirror of `_neighborhood_col` for the (few) query
    terms — and the test oracle's reference implementation."""
    out = {term}
    frontier = {term}
    for _ in range(max_edit):
        frontier = {
            t[:i] + t[i + 1 :] for t in frontier for i in range(len(t))
        }
        out |= frontier
    return out


def build_spell_table(
    term_stats: DataFrame,
    max_edit: int = 2,
    min_df: int = 1,
    out_dir: str | None = None,
) -> DataFrame:
    """SymSpell deletes table `(delkey, term, df)` from the index's
    term_stats. `min_df` drops hapax noise terms (typos in the corpus
    itself) from the correction vocabulary. ~len(term)^2/2 rows per
    dictionary term at max_edit=2 — linear in the dictionary, built in
    one exploded projection (one shuffle only if written bucketed).

    Pass `out_dir` to persist; the serving-side lookup then reads a
    plain parquet table."""
    tbl = (
        term_stats.filter(F.col("df") >= min_df)
        .select(
            F.explode(_neighborhood_col("term", max_edit)).alias("delkey"),
            "term",
            "df",
        )
    )
    if out_dir is not None:
        tbl.write.mode("overwrite").parquet(out_dir)
        return term_stats.sparkSession.read.parquet(out_dir)
    return tbl


def correct_terms(
    spell_table: DataFrame,
    terms: list[str],
    max_edit: int = 2,
    k: int = 3,
) -> DataFrame:
    """Top-k spelling candidates per query term:
    `(qterm, term, distance, df, rnk)`, ranked distance-then-df.
    Exact under Levenshtein <= max_edit (SymSpell delete-key theorem +
    built-in `levenshtein` verify). The query side is a tiny broadcast
    keys table; the spell table is only ever semi-joined on delkey."""
    spark = spell_table.sparkSession
    rows = [
        (d, t) for t in dict.fromkeys(terms) for d in py_deletes(t, max_edit)
    ]
    qkeys = spark.createDataFrame(rows, "delkey string, qterm string")
    cand = (
        spell_table.join(F.broadcast(qkeys), "delkey")
        .select("qterm", "term", "df")
        .distinct()
        .withColumn("distance", F.levenshtein("qterm", "term"))
        .filter(F.col("distance") <= max_edit)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qterm", "term", "distance", "df", "rnk")
    )


def did_you_mean(
    index,
    spell_table: DataFrame,
    query: str,
    max_edit: int = 2,
) -> tuple[str, bool]:
    """Rewrite `query` term-by-term through the index's own analyzer
    (stemmed or plain — correction happens in the index's term space):
    in-dictionary terms pass through, out-of-dictionary terms take
    their best candidate. Returns (corrected_query, changed)."""
    from honeywell_search_engine_spark.query.wand import _analyzers_for

    analyze = _analyzers_for(index)[0]
    qterms = analyze(query)
    if not qterms:
        return query, False
    best = {
        r["qterm"]: r["term"]
        for r in correct_terms(spell_table, qterms, max_edit, k=1).collect()
    }
    fixed = [best.get(t, t) for t in qterms]
    return " ".join(fixed), fixed != qterms


def suggest_terms(term_stats: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Autocomplete: dictionary terms extending `prefix`, most-frequent
    first — `(term, df)`. The StartsWith predicate pushes into the
    parquet scan; with term-sorted files (finalize sorts) row-group
    min/max prune to the prefix range."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .select("term", "df")
        .limit(k)
    )


def py_levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein DP, semantics-identical to Spark's
    `levenshtein` builtin — the serving-side verify step."""
    if a == b:
        return 0
    if not a or not b:
        return len(a) + len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
