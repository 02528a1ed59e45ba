#!/usr/bin/env python3
"""Rounding-boundary guard for oracle columns derived from doubles.

The round-4 incident: q92 hashed CAST(stddev_samp(l_extendedprice) AS
DECIMAL(18,4)) and the true value sat 7e-11 RELATIVE above its 4-dp
round-half boundary — engine/thread/merge-order last-ulp noise flipped the
rounded value on the driver's machine while every local run passed.

This guard re-computes, for every oracle column that rounds or decimal-casts
a double, the FULL-PRECISION value in DuckDB and asserts it is comfortably
far from its nearest round-half boundary. A value v rounded at k decimal
places flips when cross-engine noise exceeds its distance to the boundary:
    danger = |frac(v * 10^k) - 0.5| / 10^k          (absolute, value units)
We require danger >= max(REL_TOL * |v|, ABS_FLOOR). REL_TOL = 1e-9 is ~100x
the worst double-fold noise observed; it also structurally rejects rounding
large-magnitude folds at fine scales (|v| ~ 3e4 at 4 dp can never clear it),
which is exactly the class of column that must not be hashed.

EXACT ties (danger == 0 with frac(v*10^k) == 0.5 exactly) are SAFE, not
fatal: the double sits bit-exactly on the boundary (e.g. q28's stop_ratio
3/32 = 0.09375 — a dyadic ratio computed by one exact division in both
engines), so there is no noise to flip it, and Spark's HALF_UP and DuckDB's
half-away-from-zero agree on every exact tie. The fragile class is
NEAR-boundary (noise can cross it), not ON-boundary.

REGISTRY below must gain a probe whenever a new oracle query rounds a
double. Probes cover every row the hashed column can contain (or a
superset); each probe's SQL yields full-precision doubles in column `v`.

Usage: boundary_guard.py <sfDir> [probe_name ...]     (default: all probes)
Exit 0 iff no probed value straddles its boundary.
"""
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

REL_TOL = 1e-9
ABS_FLOOR = 1e-13

def _stopwords():
    # Mirror of graft.llm.TextAnalysis.DefaultStopwords (keep in sync).
    return ["the", "a", "and", "of"]


def _in_list(words):
    return ", ".join("'" + w + "'" for w in words)


REGISTRY = {
    "q02.avg_disc": (4, """
        SELECT avg(l_discount) AS v FROM lineitem
        GROUP BY l_returnflag, l_linestatus"""),
    "q22.avg_chars": (2, """
        SELECT avg(n_chars) AS v FROM documents
        WHERE n_chars >= 100 GROUP BY lang"""),
    "q38.p25": (4, """
        SELECT quantile_cont(l_quantity, 0.25) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q38.p50": (4, """
        SELECT quantile_cont(l_quantity, 0.5) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q38.p75": (4, """
        SELECT quantile_cont(l_quantity, 0.75) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q26.sim": (4, """
        WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id < 3),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings)
        SELECT list_dot_product(qe, ce)
               / sqrt(list_dot_product(qe, qe) * list_dot_product(ce, ce)) AS v
        FROM q JOIN c ON vec_id <> q_id"""),
    # covers q44 AND q47a (whose candidate pairs are a subset of all
    # pairs). Domain-restricted to v >= 0.29: the hashed column only
    # contains pairs the rounded value keeps (>= 0.3), and 0.29 comfortably
    # covers the filter's own decision boundary — while the UNRESTRICTED
    # all-pairs probe false-positives (the sf0.1 fixture's ~2M cosines put
    # ~6 values inside the tolerance window, ALL below 0.26, i.e. in rows
    # the hashed set structurally cannot contain).
    "q44.cos_sim": (4, """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n
                   FROM embeddings)
        SELECT s FROM (
          SELECT list_dot_product(a.v, b.v) / sqrt(a.n * b.n) AS s
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        WHERE s >= 0.29"""),
    "q28.stop_ratio": (4, f"""
        WITH d AS (SELECT string_split_regex(trim(text), '\\s+') AS ts
                   FROM documents)
        SELECT len(list_filter(ts, t -> t IN ({_in_list(_stopwords())})))
               / len(ts) AS v
        FROM d WHERE len(ts) > 0"""),
    "q33.jaccard": (4, """
        WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
                   FROM documents WHERE doc_id < 1000),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(ts)-2),
                        i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]))) AS shingle
               FROM d WHERE len(ts) >= 3),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS v
        FROM pairs
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2"""),
    "q83.avg_logprob": (4, """
        WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
                   FROM documents),
        tt AS (SELECT doc_id, token FROM t WHERE token <> ''),
        lm AS (SELECT token, count(*) AS cnt FROM tt GROUP BY token),
        tot AS (SELECT sum(cnt) AS total FROM lm)
        SELECT avg(ln(CAST(cnt AS DOUBLE) / total)) AS v
        FROM tt JOIN lm USING (token) CROSS JOIN tot
        GROUP BY doc_id"""),
    "q108.avg_logprob2": (4, """
        WITH pos AS (
          SELECT doc_id, i, arr[i] AS token
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
                FROM documents) d,
               LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) g
          WHERE arr[i] <> ''),
        bg AS (SELECT a.doc_id, a.token AS ta, b.token AS tb
               FROM pos a JOIN pos b
                 ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        lm AS (SELECT ta, tb, count(*) AS nab FROM bg GROUP BY 1, 2),
        ctx AS (SELECT ta, sum(nab) AS na FROM lm GROUP BY ta)
        SELECT avg(ln(CAST(nab AS DOUBLE) / na)) AS v
        FROM bg JOIN lm USING (ta, tb) JOIN ctx USING (ta)
        GROUP BY doc_id"""),
    "q118.med_qty": (4, """
        SELECT quantile_cont(l_quantity, 0.5) AS v FROM lineitem
        GROUP BY l_returnflag"""),
    "q118.mad_qty": (4, """
        WITH med AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
                     FROM lineitem GROUP BY l_returnflag)
        SELECT quantile_cont(abs(l.l_quantity - m.m), 0.5) AS v
        FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        GROUP BY l.l_returnflag"""),
    # q118.iqr_price carries NO probe by design: rounding a ~5e4-magnitude
    # double at 4 dp can never clear REL_TOL (max boundary distance 5e-5 <
    # 1e-9 * 5e4), which is the guard telling us not to hash it.  The query
    # instead computes price quantiles on integer CENTS (exact quarters in
    # double under any interpolation formula) and divides once — bit-exact
    # with no rounding step, so there is no boundary to guard.
    "q119.char_entropy": (4, """
        WITH chars AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
          FROM documents WHERE length(text) > 0)
        SELECT entropy(ch) AS v FROM chars GROUP BY doc_id"""),
    # q121.value carries NO round() probe: over 420k interpolated values this
    # guard found hundreds within engine-round()-divergence distance of a
    # 4-dp boundary (Spark rounds via BigDecimal decimal strings, DuckDB via
    # double multiply — near-boundary inputs genuinely diverge).  The query
    # therefore quantizes with explicit floor(v*1e4 + 0.5)/1e4 on BOTH
    # sides: the same three IEEE ops on the same bits cannot diverge, even
    # for boundary-straddling inputs, so there is no boundary to guard.
    "q84.score": (4, """
        WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
                   FROM documents),
        tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df
               FROM (SELECT DISTINCT doc_id, term FROM tt) GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS v
        FROM tf JOIN df USING (term) CROSS JOIN n"""),
}


def main():
    sf_dir = sys.argv[1]
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in sorted(REGISTRY):
        if only and name not in only:
            continue
        k, sql = REGISTRY[name]
        scale = 10.0 ** k
        vals = [r[0] for r in con.execute(sql).fetchall()]
        worst = None  # (danger, v) over non-tie values
        n_checked = 0
        n_ties = 0
        for v in vals:
            if v is None or not math.isfinite(v):
                continue
            n_checked += 1
            frac = (v * scale) % 1.0
            if frac == 0.5:  # exact binary tie — both engines agree, safe
                n_ties += 1
                continue
            danger = abs(frac - 0.5) / scale
            if worst is None or danger < worst[0]:
                worst = (danger, v)
            if danger < max(REL_TOL * abs(v), ABS_FLOOR):
                print(f"FAIL {name}: v={v!r} sits {danger:.3e} from its "
                      f"{k}-dp round-half boundary (tol "
                      f"{max(REL_TOL * abs(v), ABS_FLOOR):.3e})")
                failures += 1
        wd = f"min_dist={worst[0]:.3e} at v={worst[1]:.6g}" if worst else "no near-tie values"
        print(f"{'WARN' if n_checked == 0 else 'OK  '} {name}: "
              f"{n_checked} values ({n_ties} exact ties), {wd}")

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
