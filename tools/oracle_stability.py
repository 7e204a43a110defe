#!/usr/bin/env python3
"""Oracle determinism audit: run every oracle SQL in DuckDB at several
thread counts and flag queries whose rendered result changes — the
failure mode behind transient driver-compare flakes (parallel float
aggregation over irrational inputs, or a non-total ORDER BY letting
ties land in thread-dependent order).

Usage: python3 tools/oracle_stability.py /root/testdata/sf0.01 <verify_out>
where <verify_out> is a graft.Verify dump containing oracle_sql.json.
Caught ext_heaps' covar_pop flake in round 7. Dev-only tooling."""
import sys, os, json, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def render(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        cells = []
        for i in order:
            v = row[i]
            if v is None:
                cells.append("\\N")
            elif isinstance(v, float):
                cells.append("%.4f" % v)
            else:
                cells.append(str(v))
        out.append("\t".join(cells))
    return "\n".join(out)


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

    def hashes(threads):
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
        h = {}
        for name, sql in sorted(oracle.items()):
            try:
                cur = con.execute(sql)
                cols = [d[0] for d in cur.description]
                h[name] = hashlib.sha256(
                    render(cols, cur.fetchall()).encode()).hexdigest()
            except Exception as e:
                h[name] = "ERR:" + str(e)[:100]
        return h

    runs = [hashes(t) for t in (8, 1, 8, 4)]
    bad = [k for k in runs[0] if any(r[k] != runs[0][k] for r in runs[1:])]
    for k in bad:
        print(f"UNSTABLE {k}")
    errs = [k for k, v in runs[0].items() if v.startswith("ERR:")]
    for k in errs:
        print(f"ERROR    {k}: {runs[0][k]}")
    print(f"{len(runs[0]) - len(bad) - len(errs)} stable, "
          f"{len(bad)} unstable, {len(errs)} errors")
    sys.exit(1 if bad or errs else 0)


if __name__ == "__main__":
    main()
