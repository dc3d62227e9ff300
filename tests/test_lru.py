"""ByteLRU — the byte-bounded, lock-protected container behind every
driver-resident serving cache (decoded blocks, skip data, term metadata,
term dictionary). VERDICT r4 #2's done-criterion: insert past the bound,
assert eviction + byte ceiling; plus the ADVICE r4 race (concurrent
get/insert/evict must never KeyError or drift the byte accounting)."""

import threading

import numpy as np
import pytest

from nexlt_spark.lru import ByteLRU, _sizeof


def test_byte_ceiling_and_eviction():
    cap = 10_000
    c = ByteLRU(cap)
    arrs = {}
    for i in range(100):
        a = np.zeros(128, dtype=np.int64)  # 1 KiB payload each
        arrs[i] = a
        c[i] = a
        assert c.nbytes <= cap  # strict ceiling after every insert
    # far fewer than 100 entries survive, and the survivors are the MRU
    assert len(c) < 12
    assert 99 in c and 0 not in c


def test_lru_order_touch_on_get():
    c = ByteLRU(3 * (np.zeros(64).nbytes + 300))
    for i in range(3):
        c[i] = np.zeros(64)
    assert c.get(0) is not None  # touch 0 → MRU
    c[3] = np.zeros(64)  # evicts 1 (now LRU), not 0
    assert 0 in c and 1 not in c


def test_entry_larger_than_budget_is_evicted_not_kept():
    c = ByteLRU(100)
    c["big"] = np.zeros(1000, dtype=np.int64)
    assert "big" not in c and c.nbytes == 0


def test_overwrite_replaces_accounting():
    c = ByteLRU(1 << 20)
    c["k"] = np.zeros(100, dtype=np.int64)
    before = c.nbytes
    c["k"] = np.zeros(10, dtype=np.int64)
    assert c.nbytes < before
    assert len(c) == 1


def test_none_values_and_pop():
    c = ByteLRU(1 << 20)
    c["absent"] = None  # negative-cache shape: present, value None
    assert "absent" in c and c.get("absent", "miss") is None
    assert c.pop("absent", "d") is None
    assert c.pop("gone", "d") == "d"
    assert c.nbytes == 0


def test_callable_budget_reread_per_eviction():
    budget = {"v": 1 << 20}
    c = ByteLRU(lambda: budget["v"])
    for i in range(5):
        c[i] = np.zeros(128, dtype=np.int64)
    assert len(c) == 5
    budget["v"] = 1  # monkeypatch-style shrink
    c[5] = np.zeros(128, dtype=np.int64)  # next insert applies new cap
    assert len(c) == 0 and c.nbytes == 0


def test_sizeof_counts_retained_arrays():
    a = np.zeros(1000, dtype=np.int64)
    assert _sizeof((a, a[:10])) >= a.nbytes  # tuple recursion
    d = {"first": a, "n": np.zeros(10)}
    assert _sizeof(d) >= a.nbytes


def test_concurrent_get_insert_evict_no_crash():
    """ADVICE r4 #1: under eviction pressure, thread A's hit racing
    thread B's eviction must not KeyError, and accounting must end
    consistent (0 ≤ nbytes ≤ cap)."""
    cap = 50_000
    c = ByteLRU(cap)
    stop = threading.Event()
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        try:
            while not stop.is_set():
                k = int(rng.integers(0, 40))
                if rng.random() < 0.5:
                    c[k] = np.zeros(int(rng.integers(64, 512)), dtype=np.int64)
                else:
                    c.get(k)
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    import time

    time.sleep(1.0)
    stop.set()
    for t in threads:
        t.join()
    assert not errors
    assert 0 <= c.nbytes <= cap
    # accounting is exact: recompute from surviving entries
    total = sum(c._d[k][1] for k in c._d)
    assert total == c.nbytes
