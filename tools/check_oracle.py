import duckdb, json, sys, glob, os, threading
# usage: check_oracle.py <sfdir> <outdir> [json_report_path]
# json_report_path (round 15): per-query match record in the driver's
# CORRECTNESS_r{N}.json shape, for the at-scale (sf1) oracle gate artifact.
# ORACLE_TIMEOUT_S (round 15): per-ORACLE-query wall budget at large SFs —
# some mining oracles are quadratic SQL that DuckDB grinds on for hours at
# sf1 (observed: 25+ CPU-min, 27 GB on one dedup self-join). A timed-out
# query is EXCLUDED EXPLICITLY (distinct "excluded_timeout" outcome in the
# report, loud in stdout) — never silently dropped. The engine's own sf1
# run of the same query is recorded separately; the timeout excludes the
# ORACLE, not the engine.
sfdir, outdir = sys.argv[1], sys.argv[2]
report_path = sys.argv[3] if len(sys.argv) > 3 else None
timeout_s = float(os.environ.get('ORACLE_TIMEOUT_S', '0')) or None
sql = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
if timeout_s:  # large-SF mode: bound memory too, so a quadratic oracle OOMs the query, not the box
    con.execute("SET memory_limit='24GB'")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    p = f'{sfdir}/{t}.parquet'
    # driver testdata tables are single files; synthetic universes
    # (BuildSf1) are Spark-written directories — glob the parts
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
fails = []
report = {}
for name, q in sorted(sql.items()):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False, "err": None}
    report[name] = rec
    try:
        timer = None
        timed_out = threading.Event()
        if timeout_s:
            def _interrupt():
                timed_out.set(); con.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            oracle = con.execute(q).fetchdf()
        except Exception as e:
            if timed_out.is_set():
                rec["excluded_timeout"] = timeout_s
                print(f"EXCLUDED {name}: oracle exceeded {timeout_s}s in DuckDB "
                      f"(engine result recorded; oracle excluded, not failed)", flush=True)
                continue
            raise
        finally:
            if timer: timer.cancel()
        mine = duckdb.query(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        oracle = oracle.reindex(sorted(oracle.columns), axis=1)
        mine = mine.reindex(sorted(mine.columns), axis=1)
        if list(oracle.columns) != list(mine.columns):
            fails.append((name, f"cols oracle={list(oracle.columns)} mine={list(mine.columns)}")); continue
        rec["schema_match"] = True
        o = oracle.sort_values(by=list(oracle.columns)).reset_index(drop=True)
        m = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        if len(o) != len(m):
            fails.append((name, f"rows oracle={len(o)} mine={len(m)}")); continue
        rec["rows_match"] = True
        rec["rows"] = len(o)
        eq = o.astype(str).equals(m.astype(str))
        if not eq:
            diff = (o.astype(str) != m.astype(str))
            cells = diff.sum().sum()
            firstcol = diff.any()[diff.any()].index.tolist()
            idx = diff.any(axis=1)[diff.any(axis=1)].index[:3].tolist()
            sample = [(i, c, o.at[i,c], m.at[i,c]) for i in idx for c in firstcol if o.at[i,c]!=m.at[i,c]][:5]
            fails.append((name, f"{cells} cells differ, e.g. {sample}")); continue
        rec["hash_match"] = True
        print(f"OK   {name} ({len(o)} rows)", flush=True)
    except Exception as e:
        rec["err"] = f"{type(e).__name__}: {e}"
        fails.append((name, f"EXC {type(e).__name__}: {e}"))
for name, msg in fails:
    if report[name]["err"] is None:
        report[name]["err"] = msg
    print(f"FAIL {name}: {msg}")
excluded = sorted(n for n, r in report.items() if "excluded_timeout" in r)
print(f"\n{len(sql)-len(fails)-len(excluded)}/{len(sql)} matched"
      + (f" ({len(excluded)} oracle-timeout exclusions: {', '.join(excluded)})"
         if excluded else ""))
if report_path:
    ok_n = sum(1 for r in report.values() if r["hash_match"])
    json.dump({"sf_dir": sfdir, "out_dir": outdir,
               "matched": ok_n, "total": len(sql),
               "excluded_timeout": excluded,
               "queries": report}, open(report_path, "w"), indent=1)
    print(f"report -> {report_path}")
if fails:
    import sys
    sys.exit(1)
