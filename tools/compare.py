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
sha256, compare. Both sides STREAM (parquet record batches / cursor
fetchmany) with incremental sha256 — the r13 sf1 compare died in
pyarrow to_pylist MemoryError materializing a 45M-row result; nothing
here may hold a full result set again. Dev-only tooling — NOT part of
the shipped library.
"""
import sys, os, json, hashlib, glob
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

BATCH = 65536
# results larger than this skip the pandas dtype audit (which would
# materialize the full result twice — pandas + a re-executed .df()).
# The audit predicts the DRIVER's pandas behavior, and the driver only
# runs sf0.01 where nothing approaches this; at sf1+ the big entries
# are long-green relational ones. The schema-only array/struct check
# still runs for every entry.
AUDIT_MAX_ROWS = 5_000_000


def render_row(row, order):
    # values rendered per FIXTURES D.4; one row, no trailing newline
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
    return "\t".join(cells)


def spark_rows_iter(files, cols):
    # ALL part files in sorted name order: after a global orderBy, Spark's
    # range-partitioned write puts part-00000 < part-00001 < ... in row
    # order, so streaming them name-sorted renders the same byte stream a
    # coalesce(1) single file would. This is what lets Verify's
    # SPARK_GRAFT_DIST_WRITE=1 mode (no coalesce(1) — the r14-measured
    # single-task write tail on big-output entries) stay hash-compatible.
    for path in sorted(files):
        for batch in pq.ParquetFile(path).iter_batches(batch_size=BATCH):
            for r in batch.to_pylist():
                yield tuple(r[c] for c in cols)


def duck_rows_iter(cur):
    while True:
        rows = cur.fetchmany(BATCH)
        if not rows:
            return
        yield from rows


_END = object()


def stream_compare(spark_cols, spark_it, duck_cols, duck_it):
    """One lockstep pass over both row streams: incremental sha256 of the
    rendered TSV (identical bytes to the former whole-string hash — rows
    joined by \\n, no trailing newline), row counts, and the first
    differing row captured for the mismatch report without keeping
    either result in memory."""
    oa = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    ob = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    ha, hb = hashlib.sha256(), hashlib.sha256()
    na = nb = 0
    first_diff = None
    while True:
        ra = next(spark_it, _END)
        rb = next(duck_it, _END)
        if ra is _END and rb is _END:
            break
        la = lb = None
        if ra is not _END:
            la = render_row(ra, oa)
            if na:
                ha.update(b"\n")
            ha.update(la.encode())
            na += 1
        if rb is not _END:
            lb = render_row(rb, ob)
            if nb:
                hb.update(b"\n")
            hb.update(lb.encode())
            nb += 1
        if first_diff is None and la != lb:
            first_diff = (max(na, nb) - 1, la, lb)
    return ha.hexdigest(), hb.hexdigest(), na, nb, first_diff


def parquet_rows(files):
    # row count from the footers — never read data just to count
    return sum(pq.ParquetFile(p).metadata.num_rows for p in files)


def pandas_audit(con, oracle, outdir, skip=(), oracle_rows=None):
    """Replicates the DRIVER's pandas path (duckdb .df()), which differs
    from fetchall: HUGEINT -> float64 ('5.0000' vs '5'), arrays -> crash.
    This is exactly the divergence that let round-1's q13_pivot pass the
    fetchall compare here but fail the driver. Returns the set of entry
    names with problems (so the caller can downgrade their report rows —
    a hash_match=true row that the driver path would fail must not ship
    as green in the JSON artifact). Entries above AUDIT_MAX_ROWS on
    either side skip the dtype materialization (printed, not silent) —
    the schema array/struct check still runs."""
    import pyarrow as pa
    bad = set()
    oracle_rows = oracle_rows or {}
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
        n_spark = parquet_rows(files)
        n_duck = oracle_rows.get(name)
        if n_spark > AUDIT_MAX_ROWS or (n_duck or 0) > AUDIT_MAX_ROWS:
            print(f"AUDIT-SKIP {name}: {n_spark} rows > {AUDIT_MAX_ROWS}, "
                  "dtype audit skipped (driver runs sf0.01 only)")
            continue
        sdf = pq.read_table(sorted(files)).to_pandas()
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
        del sdf, ddf
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
                # >= : a result regenerated within the same filesystem
                # timestamp granularity as the log must re-verify, not
                # be trusted on a tie
                if files and max(os.path.getmtime(f) for f in files) >= log_mtime:
                    print(f"STALE-OK {name}: result newer than prior log, re-verifying")
                else:
                    done_ok.add(name)
    n_ok = n_bad = 0
    report = {}
    duck_counts = {}
    # rows-only entries (no oracle SQL declared): record row counts so the
    # artifact carries every battery entry, like the driver's report
    for res_dir in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(res_dir)
        if not os.path.isdir(res_dir) or name in oracle:
            continue
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        nrows = parquet_rows(files) if files else None
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
        n_spark = parquet_rows(files)
        if name in skips:
            print(f"SKIP-ORA {name}: {skips[name]}")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": n_spark,
                            "oracle_rows": None,
                            "err": f"oracle_skipped: {skips[name]}"}
            continue
        if name in done_ok:
            print(f"OK       {name} ({n_spark} rows) [prior run]")
            n_ok += 1
            # verified=False + err=None: this row was trusted from the
            # prior log, NOT re-verified end-to-end in this run. The
            # marker lives in its own field so consumers that treat any
            # non-null err as failure don't misclassify a trusted OK.
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": True, "spark_rows": n_spark,
                            "oracle_rows": None, "err": None,
                            "verified": False}
            continue
        spark_cols = pq.ParquetFile(files[0]).schema_arrow.names
        try:
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
        except Exception as e:
            print(f"SQL-ERR  {name}: {e}")
            n_bad += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": n_spark,
                            "oracle_rows": None, "err": f"oracle SQL: {e}"}
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"SCHEMA   {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_bad += 1
            report[name] = {"rows_match": None, "schema_match": False,
                            "hash_match": False, "spark_rows": n_spark,
                            "oracle_rows": None, "err": None}
            continue
        ha, hb, na, nb, first_diff = stream_compare(
            spark_cols, spark_rows_iter(files, spark_cols),
            duck_cols, duck_rows_iter(cur))
        duck_counts[name] = nb
        ent = {"rows_match": na == nb, "schema_match": True,
               "hash_match": ha == hb, "spark_rows": na,
               "oracle_rows": nb, "err": None}
        report[name] = ent
        if ent["hash_match"]:
            print(f"OK       {name} ({na} rows)")
            n_ok += 1
        else:
            print(f"HASH     {name}: {na} vs {nb} rows")
            if first_diff:
                i, x, y = first_diff
                print(f"  first diff row {i}:\n    spark: {x}\n    duck : {y}")
            n_bad += 1
    audit_bad = pandas_audit(con, oracle, outdir,
                             skip=done_ok | set(skips),
                             oracle_rows=duck_counts)
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
    # trusted-from-prior-log rows are NOT end-to-end verified in this run
    # (verified:false in the artifact); surface the count loudly so a
    # resume-stitched artifact can't read as a fully fresh stamp — a final
    # round artifact should report "0 trusted"
    n_trusted = sum(1 for e in report.values() if e.get("verified") is False)
    print(f"\n{n_ok} ok ({n_trusted} trusted from prior log, "
          f"{n_ok - n_trusted} verified this run), {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None,
                  sys.argv[5] if len(sys.argv) > 5 else None))
