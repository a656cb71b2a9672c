import time
import numpy as np
from duplicatesuricate_spark.functions.sketch import _GRAM_C, _MIX
rng = np.random.RandomState(1)
lens = rng.randint(50, 400, size=100_000).astype(np.int64)
flat = rng.randint(0, 2**63, size=int(lens.sum()), dtype=np.uint64)
k=5
def t(name, fn):
    t0=time.monotonic(); r=fn(); print(f"{name}: {time.monotonic()-t0:.2f}s"); return r
total=len(flat); n_pos=total-(k-1)
def accf():
    acc = np.zeros(n_pos, dtype=np.uint64)
    for j in range(k):
        acc += flat[j:n_pos+j] * _GRAM_C[j]
    acc ^= acc >> np.uint64(33); acc *= _MIX; acc ^= acc >> np.uint64(29)
    return acc
acc = t("acc", accf)
starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
dop = t("repeat", lambda: np.repeat(np.arange(len(lens)), lens)[:n_pos])
ends = t("ends", lambda: (starts+lens)[dop])
valid = t("valid", lambda: (np.arange(n_pos)+(k-1)) < ends)
g = t("index", lambda: acc[valid])
d = t("index2", lambda: dop[valid])
