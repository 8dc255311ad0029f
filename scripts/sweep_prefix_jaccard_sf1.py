#!/usr/bin/env python
"""sf1-scale contract evidence for dedup_prefix_filter_jaccard with a
bounded oracle (VERDICT r5, next-round item 4).

The member's all-pairs DuckDB oracle is quadratic in shingle document
frequency: at full sf1 it spilled 31 GB and ran >1.5 h without
finishing (an oracle-cost wall, not an engine limit — the Spark side
carries a documented honest-Theta(k^2) contract). The contract can
still be verified at sf1's distinguishing scale characteristic — the
10x-wide NEAR-DUPLICATE clusters gen_sf1.py creates — by bounding the
corpus, not the clusters: keep ALL 10 copies of the first N_BASE base
documents (doc_id % 5000 < N_BASE for every copy offset), so cluster
width stays 10 (the prefix/positional/length filters face the exact
boilerplate stress that defeats rareness ordering) while total corpus
size returns to sf0.1's, where the oracle is tractable.

Every other table is shared verbatim from /tmp/sf1 via symlink, and
the REGISTERED query + oracle run unchanged on the sub-corpus dir —
no special-cased SQL, so a pass here certifies the same code path the
driver grades.

Usage: python scripts/sweep_prefix_jaccard_sf1.py [query_name ...]
(default: dedup_prefix_filter_jaccard; advanced_misc_suite — the
digest suite that EMBEDS this member's oracle — is verified the same
way). Appends verdicts to /tmp/sf1_sweep/prefix_jaccard.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = "/tmp/sf1"
SUB = "/tmp/sf1_pfj"
N_BASE = 500  # base docs kept per copy; 10 copies -> 5000 docs total
SF01_DOCS = "/root/testdata/sf0.1/documents.parquet"


def build_subcorpus() -> None:
    import duckdb

    # gen_sf1.py's per-copy doc_id offset is max(doc_id)+1 of the SOURCE
    # data, not its row count — derive the period the same way so the
    # modulo below selects the SAME base docs in every copy even if the
    # fixture's ids ever become 1-based or gapped (hardcoding the row
    # count would silently skew cluster widths in that case).
    base_period = (
        duckdb.connect()
        .execute(f"SELECT MAX(doc_id) + 1 FROM read_parquet('{SF01_DOCS}')")
        .fetchone()[0]
    )

    os.makedirs(SUB, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        dst = f"{SUB}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF1}/{t}.parquet", dst)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM read_parquet('{SF1}/documents.parquet')
              WHERE doc_id % {base_period} < {N_BASE}
              ORDER BY doc_id)
        TO '{SUB}/documents.parquet' (FORMAT PARQUET)
        """
    )


def main() -> int:
    build_subcorpus()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tests.oracle_mirror import compare, duckdb_conn

    con = duckdb_conn(SUB)
    con.execute("SET memory_limit='48GB'")
    os.makedirs("/tmp/sf1_duck_spill_pfj", exist_ok=True)
    con.execute("SET temp_directory='/tmp/sf1_duck_spill_pfj'")

    names = sys.argv[1:] or ["dedup_prefix_filter_jaccard"]
    qs, osql = e.queries(), e.oracle_sql()
    os.makedirs("/tmp/sf1_sweep", exist_ok=True)
    n_fail = 0
    for name in names:
        t0 = time.time()
        pdf = qs[name](spark, SUB).toPandas()
        t_spark = time.time() - t0
        t1 = time.time()
        odf = con.execute(osql[name]).fetchdf()
        t_oracle = time.time() - t1
        problems = compare(pdf, odf)
        rec = {
            "name": name,
            "mode": f"bounded-oracle sub-corpus: 10-wide clusters x {N_BASE} bases",
            "status": "fail" if problems else "pass",
            "rows": len(pdf),
            "spark_s": round(t_spark, 2),
            "oracle_s": round(t_oracle, 2),
        }
        if problems:
            rec["problems"] = [p[:500] for p in problems]
            n_fail += 1
        with open("/tmp/sf1_sweep/prefix_jaccard.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec, indent=2), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
