"""Generate an sf1-EQUIVALENT testdata dir by replicating sf0.1 ten
times with consistent key offsets (r6 verdict item #4: convert the
100x-scale design argument into a measured two-point scaling curve).

Replication semantics: replica i shifts every surrogate key by
i * stride(table) where stride = max(key)+1, so foreign keys stay
consistent WITHIN a replica (orders->customer, lineitem->orders/part/
supplier) and replicas never collide. Dimension axes that queries group
by (nationkey, lang, source, event_type, dates) are left untouched, so
group cardinalities stay realistic while fact volume grows 10x —
exactly how a bigger TPC-H SF behaves for those axes. Text/embedding
payloads are replicated verbatim: each content now has 10 exact copies,
which keeps dedup-group sizes bounded (10) and inverted-index joins
realistic rather than quadratic.

Output goes OUTSIDE the repo (default /tmp/sf1eq); the committed
artifact is the measured table in PERFORMANCE.md, not the data.

With salt=1, each replica's document text gets a per-replica token
appended (and each embedding's first component is nudged by a tiny
per-replica epsilon), so replicas are DISTINCT contents: the corpus
duplication RATE stays that of sf0.1 instead of growing to 10 copies
per content — the controlled variant that isolates plan scaling from
problem-size scaling for the dedup family.

    python scripts/gen_sf1eq.py [/tmp/sf1eq] [replicas=10] [salt=0|1]
"""
import os
import sys
import time

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride_table} for key-offset columns
KEYED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
STRIDE_KEY = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1eq"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    salt = len(sys.argv) > 3 and sys.argv[3] == "1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()

    strides = {
        t: con.execute(
            f"SELECT MAX({k})+1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for t, k in STRIDE_KEY.items()
    }

    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, keycols in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        def _proj(c: str) -> str:
            if c in keycols:
                return f"CAST({c} + r.i * {strides[keycols[c]]} AS BIGINT) AS {c}"
            if salt and t == "documents" and c == "text":
                # constant-dup-rate replication: inject a replica-specific
                # token every 3 words, so EVERY trigram shingle contains a
                # replica token — cross-replica Jaccard drops to ~0 while
                # within-replica near-dup structure is preserved (two docs
                # sharing shingles still share the salted versions).
                # Appending one trailing token is NOT enough: it leaves
                # replicas 99% shingle-identical (measured: still ~17x
                # wall on dedup CC).
                return (
                    "CASE WHEN r.i = 0 THEN text ELSE regexp_replace("
                    "text, '(\\S+ \\S+ \\S+) ', "
                    "'\\1 zq' || CAST(r.i AS VARCHAR) || 'x ', 'g') "
                    "END AS text"
                )
            if salt and t == "embeddings" and c == "embedding":
                # per-replica deterministic sign-flip pattern: within a
                # replica all inner products are EXACTLY preserved
                # (s_ij^2 = 1), across replicas vectors decorrelate to
                # ~random-sign sums — dup rate stays that of sf0.1
                # instead of 10 exact copies per vector.
                return (
                    "list_transform(embedding, (x, j) -> CAST(CASE WHEN "
                    "hash(j * 1009 + r.i * 9176) % 2 = 0 THEN x ELSE -x "
                    "END AS FLOAT)) AS embedding"
                )
            return c

        sel = ", ".join(_proj(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet') "
            f"CROSS JOIN (SELECT UNNEST(range(0, {reps})) AS i) r) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows", flush=True)
    print(f"done in {time.time() - t0:.1f}s -> {out}")


if __name__ == "__main__":
    main()
