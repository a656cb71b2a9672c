import time, re, random
import numpy as np, pandas as pd
from duplicatesuricate_spark.config import DEFAULT_CONFIG as cfg
from duplicatesuricate_spark.functions import sketch as S

# fake 100k docs of ~230 token hashes
rng = np.random.RandomState(1)
lists = [rng.randint(-2**62, 2**62, size=rng.randint(50, 400)).astype(np.int64) for _ in range(100_000)]
ser = pd.Series(lists)
a, b = S._perm_constants(cfg)

t0=time.monotonic()
lens = ser.map(len).to_numpy(dtype=np.int64)
flat = np.concatenate(lists).view(np.uint64)
grams, doc_idx = S._gram_hashes(flat, lens, 5)
t1 = time.monotonic()-t0
t0=time.monotonic()
seg_s = np.searchsorted(doc_idx, np.arange(len(lens)))
seg_e = np.searchsorted(doc_idx, np.arange(len(lens)), side="right")
sl = [np.unique(grams[seg_s[d]:seg_e[d]]) for d in range(len(lens))]
t2 = time.monotonic()-t0
t0=time.monotonic()
out = S._sketch_batch(pd.Series([s.view(np.int64) for s in sl]), a, b, cfg.num_perms)
t3 = time.monotonic()-t0
print(f"gram={t1:.1f}s unique={t2:.1f}s sketch={t3:.1f}s total={(t1+t2+t3):.1f}s")
