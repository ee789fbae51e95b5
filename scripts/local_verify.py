#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compares Verify output
parquet vs DuckDB oracle SQL on the same tables, column-name-sorted."""
import duckdb, json, sys, glob, os
out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf_dir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
results = {}
for qdir in sorted(glob.glob(f'{out_dir}/*/')):
    name = os.path.basename(qdir.rstrip('/'))
    try:
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        spark_df = spark_df[sorted(spark_df.columns)]
        n = len(spark_df)
        if name not in oracle:
            results[name] = {'rows': n, 'check': 'rows-only', 'ok': n > 0}
            continue
        duck_df = con.sql(oracle[name]).df()
        duck_df = duck_df[sorted(duck_df.columns)]
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = {'ok': False, 'why': f'schema {list(spark_df.columns)} vs {list(duck_df.columns)}'}
            continue
        a = spark_df.sort_values(by=list(spark_df.columns)).reset_index(drop=True)
        b = duck_df.sort_values(by=list(duck_df.columns)).reset_index(drop=True)
        if len(a) != len(b):
            results[name] = {'ok': False, 'why': f'rows {len(a)} vs {len(b)}'}
            continue
        eq = True; why = ''
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if not av.astype(str).equals(bv.astype(str)):
                    import numpy as np
                    if not np.array_equal(av.to_numpy(), bv.to_numpy()):
                        eq = False; why = f'col {c} differs'
                        break
            except Exception as e:
                eq = False; why = f'col {c}: {e}'
                break
        results[name] = {'ok': eq, 'rows': n, **({'why': why} if why else {})}
    except Exception as e:
        results[name] = {'ok': False, 'why': str(e)[:200]}
bad = {k: v for k, v in results.items() if not v['ok']}
print(json.dumps(results, indent=1, default=str))
print(f"\n{len(results)-len(bad)}/{len(results)} OK")
sys.exit(1 if bad else 0)
