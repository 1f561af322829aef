#!/usr/bin/env python3
"""Dev harness for the cur_pipeline7 oracle rework (r16 VERDICT task 7):
times the pinned MATERIALIZED-hint single-statement oracle against the
staged temp-table rewrite and asserts byte-identical output through
compare.norm. Usage: python3 tools/p7_oracle_dev.py <sfDir> [old|new|both]
Dev tooling only (driver-side python env), like compare.py.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
import pandas as pd
from compare import norm, TABLES

OLD = """WITH RECURSIVE toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(
                  list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS s
                FROM toks),
         sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         binter AS (SELECT a.doc_id AS ca, b.doc_id AS bb, count(*) AS i
                    FROM sh a JOIN sh b
                      ON a.s = b.s AND a.doc_id % 10 != 0 AND b.doc_id % 10 = 0
                    GROUP BY 1, 2),
         bad AS (SELECT DISTINCT ca FROM binter
                 JOIN sizes sa ON ca = sa.doc_id
                 JOIN sizes sb ON bb = sb.doc_id
                 WHERE round(i * 1.0 / LEAST(sa.sz, sb.sz), 6) >= 0.5),
         clean AS MATERIALIZED (SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
                   WHERE d.doc_id % 10 != 0
                     AND d.doc_id NOT IN (SELECT ca FROM bad)),
         jinter AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                    WHERE a.doc_id IN (SELECT doc_id FROM clean)
                      AND b.doc_id IN (SELECT doc_id FROM clean)
                    GROUP BY 1, 2),
         pairs AS (SELECT doc_a, doc_b FROM jinter
                   JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
                   WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.5),
         edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                   UNION ALL SELECT doc_b, doc_a FROM pairs),
         reach(src, node) AS (
           SELECT DISTINCT s, s FROM edges
           UNION
           SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s),
         comp AS (SELECT src AS doc_id, min(node) AS component_id
                  FROM reach GROUP BY src),
         lab AS (SELECT c.doc_id, c.lang, c.source, c.n_chars,
                   coalesce(cm.component_id, c.doc_id) AS cid
                 FROM clean c LEFT JOIN comp cm ON c.doc_id = cm.doc_id),
         canon AS (SELECT doc_id, lang, source, n_chars FROM lab
                   QUALIFY row_number() OVER
                     (PARTITION BY cid ORDER BY n_chars DESC, doc_id DESC) = 1),
         hh AS (SELECT doc_id, source, n_chars,
                  md5('p7|' || CAST(doc_id AS VARCHAR)) AS m FROM canon),
         drawn AS (SELECT doc_id, source, n_chars,
                     (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096 +
                     (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256 +
                     (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16 +
                     (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS draw
                   FROM hh),
         capped AS (SELECT doc_id, source, n_chars FROM drawn
                    QUALIFY row_number() OVER
                      (PARTITION BY source ORDER BY draw DESC, doc_id DESC) <= 20),
         c AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS a_s
               FROM capped GROUP BY 1),
         t2 AS (SELECT sum(a_s) AS total FROM c),
         s2 AS (SELECT source, a_s,
                  pow(a_s / (SELECT total FROM t2), 0.7) AS ps_a FROM c),
         z AS (SELECT sum(ps_a) AS z FROM s2)
         SELECT source, CAST(a_s AS BIGINT) AS avail_tokens,
                round(ps_a / (SELECT z FROM z), 6) AS weight,
                round(1000000.0 * ps_a / (SELECT z FROM z), 2) AS alloc_tokens,
                round(1000000.0 * ps_a / (SELECT z FROM z) / a_s, 6) AS epochs
         FROM s2"""

NEW = """CREATE OR REPLACE TEMP TABLE p7_sh AS
           WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
           SELECT doc_id, unnest(list_distinct(
                    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS s
           FROM toks;
         CREATE OR REPLACE TEMP TABLE p7_sizes AS
           SELECT doc_id, count(*) AS sz FROM p7_sh GROUP BY 1;
         CREATE OR REPLACE TEMP TABLE p7_clean AS
           WITH binter AS (SELECT a.doc_id AS ca, b.doc_id AS bb, count(*) AS i
                           FROM p7_sh a JOIN p7_sh b
                             ON a.s = b.s AND a.doc_id % 10 != 0 AND b.doc_id % 10 = 0
                           GROUP BY 1, 2),
                bad AS (SELECT DISTINCT ca FROM binter
                        JOIN p7_sizes sa ON ca = sa.doc_id
                        JOIN p7_sizes sb ON bb = sb.doc_id
                        WHERE round(i * 1.0 / LEAST(sa.sz, sb.sz), 6) >= 0.5)
           SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
           WHERE d.doc_id % 10 != 0
             AND d.doc_id NOT IN (SELECT ca FROM bad);
         CREATE OR REPLACE TEMP TABLE p7_shc AS
           SELECT sh.doc_id, sh.s FROM p7_sh sh
           JOIN p7_clean c USING (doc_id)
           WHERE sh.s IN (SELECT s FROM p7_sh sh2 JOIN p7_clean c2 USING (doc_id)
                          GROUP BY s HAVING count(*) > 1);
         CREATE OR REPLACE TEMP TABLE p7_comp AS
           WITH RECURSIVE
                jinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                           FROM p7_shc a JOIN p7_shc b
                             ON a.s = b.s AND a.doc_id < b.doc_id
                           GROUP BY 1, 2),
                pairs AS (SELECT doc_a, doc_b FROM jinter
                          JOIN p7_sizes sa ON doc_a = sa.doc_id
                          JOIN p7_sizes sb ON doc_b = sb.doc_id
                          WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.5),
                edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                          UNION ALL SELECT doc_b, doc_a FROM pairs),
                reach(src, node) AS (
                  SELECT DISTINCT s, s FROM edges
                  UNION
                  SELECT r.src, e.d FROM reach r JOIN edges e ON r.node = e.s)
           SELECT src AS doc_id, min(node) AS component_id
           FROM reach GROUP BY src;
         WITH lab AS (SELECT c.doc_id, c.lang, c.source, c.n_chars,
                        coalesce(cm.component_id, c.doc_id) AS cid
                      FROM p7_clean c LEFT JOIN p7_comp cm ON c.doc_id = cm.doc_id),
              canon AS (SELECT doc_id, lang, source, n_chars FROM lab
                        QUALIFY row_number() OVER
                          (PARTITION BY cid ORDER BY n_chars DESC, doc_id DESC) = 1),
              hh AS (SELECT doc_id, source, n_chars,
                       md5('p7|' || CAST(doc_id AS VARCHAR)) AS m FROM canon),
              drawn AS (SELECT doc_id, source, n_chars,
                          (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096 +
                          (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256 +
                          (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16 +
                          (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS draw
                        FROM hh),
              capped AS (SELECT doc_id, source, n_chars FROM drawn
                         QUALIFY row_number() OVER
                           (PARTITION BY source ORDER BY draw DESC, doc_id DESC) <= 20),
              c AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS a_s
                    FROM capped GROUP BY 1),
              t2 AS (SELECT sum(a_s) AS total FROM c),
              s2 AS (SELECT source, a_s,
                       pow(a_s / (SELECT total FROM t2), 0.7) AS ps_a FROM c),
              z AS (SELECT sum(ps_a) AS z FROM s2)
         SELECT source, CAST(a_s AS BIGINT) AS avail_tokens,
                round(ps_a / (SELECT z FROM z), 6) AS weight,
                round(1000000.0 * ps_a / (SELECT z FROM z), 2) AS alloc_tokens,
                round(1000000.0 * ps_a / (SELECT z FROM z) / a_s, 6) AS epochs
         FROM s2"""


def run(sql, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    df = norm(con.execute(sql).df())
    return df, time.time() - t0


def main():
    sf_dir = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    if which in ("new", "both"):
        dn, tn = run(NEW, sf_dir)
        print(f"new: {tn:.1f}s {len(dn)} rows")
    if which in ("old", "both"):
        do, to = run(OLD, sf_dir)
        print(f"old: {to:.1f}s {len(do)} rows")
    if which == "both":
        pd.testing.assert_frame_equal(dn, do, check_dtype=True)
        print(f"IDENTICAL; speedup {to / tn:.2f}x")


if __name__ == "__main__":
    main()
