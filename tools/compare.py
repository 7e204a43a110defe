#!/usr/bin/env python3
"""Local replica of the driver's correctness compare (FIXTURES.md §D).

Usage: python3 tools/compare.py SFDIR OUTDIR [out.json] [skips.tsv] [prior.log]

skips.tsv: "name<TAB>reason" entries whose ORACLE is infeasible at this
scale (recorded as oracle_skipped, not failure). prior.log: a previous
run's stdout; its OK entries are trusted and not re-run.

With a third argument, also writes a CORRECTNESS-style per-query JSON
artifact (rows/schema/hash match booleans, row counts, err) so local
sweeps at non-driver scale factors (e.g. the TwinGen sf1 twin) produce
the same artifact shape the driver does.

For each query result parquet under outDir and its oracle SQL in
oracle_sql.json: run the SQL in DuckDB over the sf tables, render both
result sets as TSV (columns sorted by name, \\N for NULL, doubles %.4f),
sha256, compare. Dev-only tooling — NOT part of the shipped library.
"""
import sys, os, json, hashlib, glob
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def render(cols, rows):
    # cols sorted by name; values rendered per FIXTURES D.4
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        cells = []
        for i in order:
            v = row[i]
            if v is None:
                cells.append("\\N")
            elif isinstance(v, float):
                # signed-zero normalization: Spark's BigDecimal HALF_UP
                # round maps a tiny negative to +0.0 while DuckDB's IEEE
                # round keeps -0.0 — same value, different "%.4f" render
                # (first seen on ext_cluster_ari at sf1, ARI ~ -2e-7)
                cells.append("%.4f" % (abs(v) if v == 0 else v))
            else:
                cells.append(str(v))
        out.append("\t".join(cells))
    return "\n".join(out)


def pandas_audit(con, oracle, outdir, skip=()):
    """Replicates the DRIVER's pandas path (duckdb .df()), which differs
    from fetchall: HUGEINT -> float64 ('5.0000' vs '5'), arrays -> crash.
    This is exactly the divergence that let round-1's q13_pivot pass the
    fetchall compare here but fail the driver. Returns the set of entry
    names with problems (so the caller can downgrade their report rows —
    a hash_match=true row that the driver path would fail must not ship
    as green in the JSON artifact)."""
    import pyarrow as pa
    bad = set()
    for name in sorted(oracle):
        if name in skip:  # trusted from a prior full run (resume path)
            continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            continue
        sch = pq.read_schema(files[0])
        arr = [f.name for f in sch
               if pa.types.is_list(f.type) or pa.types.is_struct(f.type)]
        if arr:
            print(f"PANDAS   {name}: array/struct columns crash the driver sort: {arr}")
            bad.add(name)
        sdf = pq.read_table(files[0]).to_pandas()
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"PANDAS   {name}: .df() failed: {e}")
            bad.add(name)
            continue
        for c in sdf.columns:
            if c not in ddf.columns:
                print(f"PANDAS   {name}.{c}: missing from oracle result "
                      f"(oracle cols: {list(ddf.columns)})")
                bad.add(name)
                continue
            sk, dk = sdf[c].dtype.kind, ddf[c].dtype.kind
            if (sk in "iu") != (dk in "iu"):
                print(f"PANDAS   {name}.{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                      " (int-vs-float render mismatch; CAST the oracle)")
                bad.add(name)
    return bad


def main(sfdir, outdir, jsonout=None, skipfile=None, donelog=None):
    con = duckdb.connect()
    # bound DuckDB so one quadratic oracle can't OOM the process or fill
    # the disk unobserved (both happened on the r12 sf1 sweep), and give
    # it an explicit spill dir we can watch
    con.execute("SET memory_limit='40GB'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # NOTE: preserve_insertion_order=false was tried here and REVERTED —
    # on this DuckDB build it returned large ORDER BY results out of
    # order (ext_stickiness came back with its sorted tail scrambled),
    # fabricating hash mismatches
    for t in TABLES:
        # driver fixtures are single files; Spark-written twins (TwinGen)
        # are directories of part files
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # entries whose ORACLE is declared infeasible at this scale (file:
    # "name<TAB>reason" lines); the engine result still ran — recorded
    # as oracle_skipped, not failure
    skips = {}
    if skipfile:
        for line in open(skipfile):
            if line.strip():
                name, _, reason = line.rstrip("\n").partition("\t")
                skips[name] = reason or "oracle skipped"
    # resume: entries already OK in a prior run's log are trusted — but
    # ONLY if the result parquet predates the log (a result regenerated
    # by changed code after the log was written was never verified; the
    # r12-advice failure mode was a fully-green artifact from stale OKs)
    done_ok = set()
    if donelog:
        log_mtime = os.path.getmtime(donelog)
        for line in open(donelog):
            if line.startswith("OK       "):
                name = line.split()[1]
                files = glob.glob(os.path.join(outdir, name, "*.parquet"))
                if files and max(os.path.getmtime(f) for f in files) > log_mtime:
                    print(f"STALE-OK {name}: result newer than prior log, re-verifying")
                else:
                    done_ok.add(name)
    n_ok = n_bad = 0
    report = {}
    # rows-only entries (no oracle SQL declared): record row counts so the
    # artifact carries every battery entry, like the driver's report
    for res_dir in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(res_dir)
        if not os.path.isdir(res_dir) or name in oracle:
            continue
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        nrows = pq.read_table(files[0]).num_rows if files else None
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": nrows,
                        "oracle_rows": None, "err": "no_oracle"}
    for name in sorted(oracle):
        res_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"MISSING  {name}")
            n_bad += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": "missing result"}
            continue
        tbl = pq.read_table(files[0])
        if name in skips:
            print(f"SKIP-ORA {name}: {skips[name]}")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": tbl.num_rows,
                            "oracle_rows": None,
                            "err": f"oracle_skipped: {skips[name]}"}
            continue
        if name in done_ok:
            print(f"OK       {name} ({tbl.num_rows} rows) [prior run]")
            n_ok += 1
            # oracle_rows=None + an explicit marker: this row was trusted
            # from the prior log, NOT re-verified end-to-end in this run —
            # don't fabricate an oracle row count we never fetched
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": True, "spark_rows": tbl.num_rows,
                            "oracle_rows": None, "err": "trusted_prior_run"}
            continue
        spark_cols = list(tbl.column_names)
        spark_rows = [tuple(r[c] for c in spark_cols) for r in tbl.to_pylist()]
        try:
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"SQL-ERR  {name}: {e}")
            n_bad += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(spark_rows),
                            "oracle_rows": None, "err": f"oracle SQL: {e}"}
            continue
        ent = {"rows_match": len(spark_rows) == len(duck_rows),
               "schema_match": sorted(spark_cols) == sorted(duck_cols),
               "hash_match": False, "spark_rows": len(spark_rows),
               "oracle_rows": len(duck_rows), "err": None}
        report[name] = ent
        if not ent["schema_match"]:
            print(f"SCHEMA   {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_bad += 1
            continue
        a = render(spark_cols, spark_rows)
        b = render(duck_cols, duck_rows)
        ha, hb = hashlib.sha256(a.encode()).hexdigest(), hashlib.sha256(b.encode()).hexdigest()
        if ha == hb:
            ent["hash_match"] = True
            print(f"OK       {name} ({len(spark_rows)} rows)")
            n_ok += 1
        else:
            print(f"HASH     {name}: {len(spark_rows)} vs {len(duck_rows)} rows")
            al, bl = a.split("\n"), b.split("\n")
            for i, (x, y) in enumerate(zip(al, bl)):
                if x != y:
                    print(f"  first diff row {i}:\n    spark: {x}\n    duck : {y}")
                    break
            n_bad += 1
    audit_bad = pandas_audit(con, oracle, outdir,
                             skip=done_ok | set(skips))
    n_bad += len(audit_bad)
    # downgrade audit failures in the artifact: the fetchall hash may have
    # matched, but the DRIVER's pandas path would diverge on these — a
    # green row here would overstate the committed artifact
    for name in audit_bad:
        if name in report:
            report[name]["hash_match"] = False
            report[name]["err"] = "pandas_audit mismatch"
    if jsonout:
        with open(jsonout, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {jsonout} ({len(report)} entries)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None,
                  sys.argv[5] if len(sys.argv) > 5 else None))
