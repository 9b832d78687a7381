import duckdb, json, sys, glob, os
sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['documents','events','lineitem','orders','customer','supplier','part','nation','region','embeddings']:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{files[0]}')").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fail += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"{name}: SCHEMA MISMATCH spark={gcols} oracle={ecols}"); fail += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT spark={len(g)} oracle={len(e)}"); fail += 1; continue
    eq = g.astype(str).equals(e.astype(str))
    if eq: print(f"{name}: OK rows={len(g)}"); ok += 1
    else:
        print(f"{name}: VALUE MISMATCH rows={len(g)}"); fail += 1
        diff = (g.astype(str) != e.astype(str)).any(axis=1)
        print("spark:", g[diff].head(5).to_string())
        print("oracle:", e[diff].head(5).to_string())
print(f"=== {ok} ok / {fail} fail")
