import duckdb, json, sys, glob, os
sfdir, outdir = sys.argv[1], sys.argv[2]
sql = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    p = f'{sfdir}/{t}.parquet'
    # driver testdata tables are single files; synthetic universes
    # (BuildSf1) are Spark-written directories — glob the parts
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
fails = []
for name, q in sorted(sql.items()):
    try:
        oracle = con.execute(q).fetchdf()
        mine = duckdb.query(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        oracle = oracle.reindex(sorted(oracle.columns), axis=1)
        mine = mine.reindex(sorted(mine.columns), axis=1)
        if list(oracle.columns) != list(mine.columns):
            fails.append((name, f"cols oracle={list(oracle.columns)} mine={list(mine.columns)}")); continue
        o = oracle.sort_values(by=list(oracle.columns)).reset_index(drop=True)
        m = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        if len(o) != len(m):
            fails.append((name, f"rows oracle={len(o)} mine={len(m)}")); continue
        eq = o.astype(str).equals(m.astype(str))
        if not eq:
            diff = (o.astype(str) != m.astype(str))
            cells = diff.sum().sum()
            firstcol = diff.any()[diff.any()].index.tolist()
            idx = diff.any(axis=1)[diff.any(axis=1)].index[:3].tolist()
            sample = [(i, c, o.at[i,c], m.at[i,c]) for i in idx for c in firstcol if o.at[i,c]!=m.at[i,c]][:5]
            fails.append((name, f"{cells} cells differ, e.g. {sample}")); continue
        print(f"OK   {name} ({len(o)} rows)")
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {e}"))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(sql)-len(fails)}/{len(sql)} matched")
if fails:
    import sys
    sys.exit(1)
