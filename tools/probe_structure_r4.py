"""Round-4 formulation probe (host-side, numpy only — no TPU needed).

The round-3 verdict: the bitmap front end does B x Gc x Tl work (every
query against every term) with an MXU roofline of ~38k q/s at 10M keys;
round 4 must find a posting-mass-proportional formulation.  Candidate
designs differ in ONE empirical dimension — how tightly term clustering
can bound per-block scores on a stop-gram-dominated corpus.  This probe
measures, on the real bench corpus + real mutated queries:

  1. gram posting-length distribution (how stop-gram heavy is it?)
  2. per-query posting mass P_q, and its rare-only part P_R(cutoff)
  3. distinct frequent-gram signatures ("runs") vs cutoff — the size of
     a run-level table whose frequent part is EXACT per run
  4. true candidate mass per query: #terms with hits >= sigma_100*nqg
     (what an ideal selection would rescore) and #blocks/runs they span
  5. block presence-bound quality under F-signature term ordering:
     how many blocks a top-kb-by-bound selection must keep for the
     exactness guard (sigma_100 > kept-bound) to succeed

Usage: python tools/probe_structure_r4.py [n_keys] [n_queries]
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _mutate, _product_names  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    thr = 0.3
    limit = 100

    log(f"corpus {n_keys} keys")
    words = _product_names(n_keys, seed=2)
    rng = random.Random(7)
    queries = [_mutate(rng, rng.choice(words)) for _ in range(n_q)]

    # --- normalized terms + gram extraction (index-side set semantics) ----
    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.core import grams as gramlib
    from stringsearchlib_tpu.core import text as textlib

    cfg = IndexConfig()
    g = cfg.gram_size
    tables = textlib.TextTables(wide=cfg.wide)
    t0 = time.time()
    tok, lens = textlib.encode_batch(words, cfg.wide)
    tok, lens = textlib.normalize_matrix(tok, lens, tables)
    log(f"normalized in {time.time()-t0:.1f}s; width {tok.shape[1]}")

    # long tier only (len >= 2g)
    is_long = lens >= 2 * g
    lt, ll = tok[is_long], lens[is_long]
    tl = int(is_long.sum())
    log(f"long tier {tl} terms")

    # per-term DISTINCT gram ids (index side dedups per term)
    t0 = time.time()
    ids, valid = gramlib.gram_ids(lt, ll, g, cfg.wide, None)
    nwin = ids.shape[1]
    rows = np.repeat(np.arange(tl, dtype=np.int64), nwin).reshape(tl, nwin)
    flat_t = rows.ravel()[valid.ravel()]
    flat_g = ids.ravel()[valid.ravel()]
    # dedup (term, gram)
    key = flat_t * (1 << 24) + flat_g.astype(np.int64)  # gram ids < 2^24
    key = np.unique(key)
    e_t = (key >> 24).astype(np.int64)
    e_g = (key & ((1 << 24) - 1)).astype(np.int32)
    uniq_g, g_slot = np.unique(e_g, return_inverse=True)
    G = uniq_g.size
    log(f"{e_t.size} postings, {G} distinct grams ({time.time()-t0:.1f}s)")

    plen = np.bincount(g_slot, minlength=G)
    order = np.argsort(plen)[::-1]
    cum = np.cumsum(plen[order]) / plen.sum()
    report = {"n_keys": n_keys, "n_long": tl, "G": G,
              "postings": int(e_t.size)}
    report["plen_top"] = plen[order][:20].tolist()
    report["mass_cum_at"] = {
        str(k): round(float(cum[min(k, G) - 1]), 4)
        for k in (16, 64, 128, 256, 512, 1024)
    }
    log("top plens:", report["plen_top"])
    log("cum mass at F:", report["mass_cum_at"])

    # --- query gram slots -------------------------------------------------
    qtok, qlens = textlib.encode_batch(queries, cfg.wide)
    qtok, qlens = textlib.normalize_matrix(qtok, qlens, tables)
    qids, qvalid = gramlib.gram_ids(qtok, qlens, g, cfg.wide, None)
    # map to slots (grams absent from the index get -1)
    qslot = np.searchsorted(uniq_g, qids)
    qslot = np.where(
        (qslot < G) & (uniq_g[np.clip(qslot, 0, G - 1)] == qids), qslot, -1
    )
    qslot = np.where(qvalid, qslot, -1)
    nqg = qvalid.sum(axis=1)

    # posting mass per query at various rare cutoffs
    pq = {}
    for cutoff in (0, 1000, 5000, 20000, 50000, 200_000):
        mass = np.where(
            (qslot >= 0) & (plen[np.clip(qslot, 0, G - 1)] > cutoff)
            if cutoff == 0 else
            (qslot >= 0) & (plen[np.clip(qslot, 0, G - 1)] <= cutoff),
            plen[np.clip(qslot, 0, G - 1)], 0,
        ).sum(axis=1)
        k = "P_q_total" if cutoff == 0 else f"P_rare_le_{cutoff}"
        pq[k] = {"p50": int(np.median(mass)), "max": int(mass.max())}
    report["posting_mass"] = pq
    log("posting mass:", json.dumps(pq))

    # --- frequent-signature runs vs cutoff --------------------------------
    # sort postings by term for per-term signature hashing
    t_order = np.argsort(e_t, kind="stable")
    st, sg = e_t[t_order], g_slot[t_order]
    runs_info = {}
    for F in (64, 128, 256, 512):
        fmask_g = np.zeros(G, bool)
        fmask_g[order[:F]] = True
        sel = fmask_g[sg]
        ft, fg = st[sel], sg[sel]
        # per-term signature hash (order-independent is wrong — use sorted
        # order within term, which t_order+gram sort gives if we sort pairs)
        pk = ft * (1 << 24) + fg
        pk.sort()
        ft2 = (pk >> 24).astype(np.int64)
        fg2 = (pk & ((1 << 24) - 1)).astype(np.uint64)
        h = np.zeros(tl, np.uint64)
        # iterative FNV-ish mix per term via segment ops
        # h[t] = mix of its sorted gram list: use np.add.at of g*prime^pos?
        # simpler: two passes of multiply-xor via cumulative trick:
        # hash = sum(g_i * P1^i) is order-dependent; position within term:
        starts = np.searchsorted(ft2, np.arange(tl))
        pos = np.arange(ft2.size) - starts[ft2]
        P1 = np.uint64(0x9E3779B97F4A7C15)
        contrib = (fg2 + np.uint64(1)) * (P1 ** (pos.astype(np.uint64) % np.uint64(31)))
        h2 = np.zeros(tl, np.uint64)
        np.add.at(h2, ft2, contrib)
        cnt_f = np.bincount(ft2, minlength=tl).astype(np.uint64)
        h = h2 ^ (cnt_f * np.uint64(0xC2B2AE3D27D4EB4F))
        nsig = np.unique(h).size
        runs_info[str(F)] = {"distinct_sigs": int(nsig),
                             "avg_run": round(tl / max(nsig, 1), 1)}
        log(f"F={F}: {nsig} distinct signatures, avg run {tl/max(nsig,1):.1f}")
    report["runs"] = runs_info

    # --- row collapse: grams with IDENTICAL posting lists -----------------
    # (such rows can share one matmul row with summed query multiplicity)
    g_order = np.lexsort((e_t, g_slot))
    csr_g = g_slot[g_order]
    csr_t = e_t[g_order]
    gptr = np.searchsorted(csr_g, np.arange(G + 1))
    P1 = np.uint64(0x100000001B3)
    hrow = np.full(G, np.uint64(0xCBF29CE484222325))
    # FNV over each row's sorted term list via vectorized per-position mix
    gpos = np.arange(csr_t.size) - gptr[csr_g]
    mix = (csr_t.astype(np.uint64) + np.uint64(1)) * (
        P1 ** (gpos.astype(np.uint64) % np.uint64(29))
    )
    acc = np.zeros(G, np.uint64)
    np.add.at(acc, csr_g, mix)
    hrow = acc ^ (plen.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    n_classes = np.unique(hrow).size
    report["row_classes"] = {"G": G, "classes": int(n_classes)}
    log(f"row collapse: {G} grams -> {n_classes} distinct posting lists")
    # batch-union collapse: union rows of the 32-query sample
    bu = np.unique(qslot[qslot >= 0])
    report["batch_union"] = {
        "rows": int(bu.size),
        "classes": int(np.unique(hrow[bu]).size),
    }
    log(f"sample batch union {bu.size} rows -> "
        f"{np.unique(hrow[bu]).size} classes")

    # --- per-query true hits + h*-selection quality (current term order) --
    W = 128
    nb = -(-tl // W)
    stats = []
    for qi in range(min(n_q, 32)):
        sl = qslot[qi][qslot[qi] >= 0]
        if sl.size == 0:
            continue
        uq, mult = np.unique(sl, return_counts=True)
        hits = np.zeros(tl, np.int32)
        for u, m in zip(uq, mult):
            hits[csr_t[gptr[u]:gptr[u + 1]]] += m
        nq = int(nqg[qi])
        score = hits / max(nq, 1)
        top = np.sort(score)[::-1]
        sigma = float(top[min(limit, tl) - 1])
        h_sig = int(np.ceil(sigma * nq - 1e-9))
        n_pass_thr = int((score >= thr).sum())
        n_pass_sig = int((hits >= h_sig).sum())
        bmax = np.zeros(nb, np.int32)
        np.maximum.at(bmax, np.arange(tl) // W, hits)
        bm1k = bmax.reshape(-1, 8).max(axis=1) if nb % 8 == 0 else None
        if bm1k is None:
            pad = np.pad(bmax, (0, (-nb) % 8), constant_values=0)
            bm1k = pad.reshape(-1, 8).max(axis=1)
        # h* for block budgets: smallest h with #128-blocks >= h <= budget
        row = {"nqg": nq, "sigma100": round(sigma, 3),
               "n_pass_thr": n_pass_thr, "n_terms_ge_hsig": n_pass_sig,
               "blk128_ge_hsig": int((bmax >= h_sig).sum()),
               "blk1k_ge_hsig": int((bm1k >= max(h_sig, 1)).sum())}
        for budget in (256, 512, 1024):
            cnt = np.array([(bmax >= v).sum() for v in range(nq + 2)])
            hs = int(np.argmax(cnt <= budget))  # min v with count <= budget
            # guard succeeds iff the 100th key score >= h*/nqg (uniform w)
            row[f"hstar_b{budget}"] = hs
            row[f"guard_ok_b{budget}"] = bool(sigma * nq >= hs - 1e-9)
        stats.append(row)
        if qi < 8:
            log(f"q{qi}: nqg={nq} sig={sigma:.3f} h_sig={h_sig} "
                f"terms>=h_sig={n_pass_sig} blk128={row['blk128_ge_hsig']} "
                f"blk1k={row['blk1k_ge_hsig']} "
                f"h*512={row['hstar_b512']} ok={row['guard_ok_b512']}")
    agg = {}
    for k in stats[0]:
        v = np.array([s[k] for s in stats], float)
        agg[k] = {"p50": round(float(np.median(v)), 3),
                  "max": round(float(v.max()), 3)}
    report["per_query"] = agg
    log("aggregate:", json.dumps(agg))
    with open(f"/tmp/probe_r4_{n_keys}.json", "w") as f:
        json.dump(report, f, indent=1)
    log(f"written /tmp/probe_r4_{n_keys}.json")


if __name__ == "__main__":
    main()
