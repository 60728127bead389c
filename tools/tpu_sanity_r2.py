"""Mid-scale TPU sanity: sketch path + device postings on a gram-rich corpus.

Builds ~400k keys (gram-rich: digits+letters), forces the sketch path,
verifies a query sample against the runs/dense answers computed on the same
device, and times search_batch.  Run ALONE (one tunnel client).
"""
import os, random, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np

from stringsearchlib_tpu.config import IndexConfig
from stringsearchlib_tpu.index.build import build_index
from stringsearchlib_tpu.search.engine import SearchEngine

rng = random.Random(0)
ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"
def word():
    n = rng.randint(8, 30)
    return "".join(rng.choice(ALPHA) for _ in range(n))

N = int(os.environ.get("SANITY_KEYS", 400_000))
t0 = time.perf_counter()
words = [word() for _ in range(N)]
print(f"gen {N}: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
host = build_index(words, 1, None, IndexConfig())
print(f"build (device postings): {time.perf_counter()-t0:.1f}s, "
      f"grams={host.n_grams}, terms={host.n_terms}", flush=True)

eng = SearchEngine(host)
eng.GM_BUDGET = 0  # force off dense incidence -> sketch
eng.SKETCH_MIN_TERMS = 0

def mutate(s):
    c = list(s)
    for _ in range(rng.randint(0, 2)):
        i = rng.randrange(len(c))
        c[i] = rng.choice(ALPHA)
    return "".join(c)

queries = [mutate(rng.choice(words)) for _ in range(512)]

t0 = time.perf_counter()
sk = host.sketch_tables(eng.SKETCH_BUDGET)
import jax; jax.device_get(sk[0][:1, :1])
print(f"sketch tables: {time.perf_counter()-t0:.1f}s d=2^{sk[3]} "
      f"inc={sk[0].shape}", flush=True)

t0 = time.perf_counter()
res = eng.search_batch(queries, 0.3, 100)
print(f"first batch (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    res = eng.search_batch(queries, 0.3, 100)
    dt = time.perf_counter() - t0
    print(f"rep{rep}: {dt*1e3:.0f} ms = {len(queries)/dt:.0f} q/s", flush=True)

# correctness spot check vs the runs path (independent exact front end)
sub = queries[:48]
a = eng.search_batch(sub, 0.3, 100, mode="candidates")
host._sketch_cache = False  # disable sketch -> runs front end
b = eng.search_batch(sub, 0.3, 100, mode="candidates")
c = eng.search_batch(sub, 0.3, 100, mode="dense")
bad = sum(x != y for x, y in zip(a, b)) + sum(x != z for x, z in zip(a, c))
print(f"parity sketch-vs-runs-vs-dense on 48 queries: mismatches={bad}",
      flush=True)
assert bad == 0
print("SANITY OK", flush=True)
