import sys, time
sys.path.insert(0, '.'); sys.path.insert(0, 'tests')
from embulk_executor_mapreduce_spark.session import get_spark
from embulk_executor_mapreduce_spark import catalog
from oracle import compare
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
only = sys.argv[2].split(',') if len(sys.argv) > 2 else None
spark = get_spark()
fails = []
for name, e in catalog.entries().items():
    if only and name not in only: continue
    t0 = time.time()
    try:
        if e.oracle is None:
            n = e.fn(spark, sf).count()
            print(f"{name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]", flush=True)
            continue
        ok, msg = compare(spark, sf, e.fn, e.oracle)
        print(f"{name}: {'OK' if ok else 'FAIL'} {msg} [{time.time()-t0:.1f}s]", flush=True)
        if not ok: fails.append((name, msg))
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}", flush=True)
        fails.append((name, str(ex)[:300]))
print("\n=== FAILURES ===" if fails else "\n=== ALL GREEN ===")
for n, m in fails: print(n, m[:200])
