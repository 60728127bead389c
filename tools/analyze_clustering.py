"""Would lex-clustering long terms make coarse block bounds selective?

Host-only analysis (run with env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu).

For the bench's gram-dense corpus at ANALYZE_KEYS keys:
  * block = 128 consecutive long terms; coarse bound for (query, block) =
    sum of query-gram multiplicities over grams present in the block's
    UNION gram set (>= any member term's true hit count);
  * a block "passes" when bound >= threshold * n_qgrams -- only passing
    blocks would need exact rescoring in a coarse-pruned front end.

Reports blocks passing per query under (a) build order, (b) lex-sorted
term order, plus the TRUE passing terms/blocks, for threshold 0.3/0.5.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = int(os.environ.get("ANALYZE_KEYS", 1_000_000))
NQ = 512
BLK = int(os.environ.get("ANALYZE_BLK", 128))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import random

    import bench
    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.core import grams as gramlib
    from stringsearchlib_tpu.core import text as textlib
    from stringsearchlib_tpu.index.build import build_index

    words = bench._product_names(N, seed=2)
    log(f"corpus {N}")
    host = build_index(words, 1, None, IndexConfig(), to_device=False)
    d = host.device
    lt = np.asarray(d.long_tokens)
    ll = np.asarray(d.long_lengths)
    tl, width = lt.shape
    G = host.n_grams
    log(f"n_long={tl} G={G}")

    # per-term gram slot sets -> (Tl, G) packed incidence
    ids, valid = gramlib.gram_ids(lt, ll, 3, False, None)
    slots = np.full(ids.shape, -1, np.int32)
    fv = valid.ravel()
    slots.ravel()[fv] = host.lookup_gram_slots(ids.ravel()[fv])
    gb = (G + 7) // 8
    inc = np.zeros((tl, G), bool)
    rows = np.repeat(np.arange(tl), slots.shape[1])
    cols = slots.ravel()
    keep = cols >= 0
    inc[rows[keep], cols[keep]] = True
    log(f"incidence built ({inc.mean() * G:.1f} grams/term avg)")

    # lex order of long terms (length-aware row sort)
    keyed = np.concatenate(
        [lt, ll.astype(lt.dtype).reshape(-1, 1)], axis=1)
    keyed = np.ascontiguousarray(keyed)
    view = keyed.view([("", np.void, keyed.dtype.itemsize * keyed.shape[1])])
    lex = np.argsort(view.ravel(), kind="stable")

    # queries
    rng = random.Random(7)
    qs = [bench._mutate(rng, rng.choice(words)) for _ in range(NQ)]
    tokens, lengths = textlib.encode_batch(qs, False)
    ntok, nlen = textlib.normalize_matrix(tokens, lengths, host.tables)
    qids, qvalid = gramlib.gram_ids(ntok, nlen, 3, False, None)
    qslots = np.full(qids.shape, -1, np.int32)
    qv = qvalid.ravel()
    qslots.ravel()[qv] = host.lookup_gram_slots(qids.ravel()[qv])
    mult = np.zeros((NQ, G), np.float32)
    for r in range(NQ):
        s = qslots[r][qslots[r] >= 0]
        np.add.at(mult[r], s, 1.0)
    nqg = np.maximum(nlen - 2, 1).astype(np.float32)
    log("queries prepped")

    # true per-term hits (via incidence in f32 chunks)
    true_pass = {}
    for th in (0.3, 0.5):
        need = th * nqg  # (NQ,)
        pass_terms = np.zeros(NQ, np.int64)
        pass_blocks = {"build": np.zeros(NQ, np.int64),
                       "lex": np.zeros(NQ, np.int64)}
        chunk = 200_000
        pos_of_lex = np.empty(tl, np.int64)
        pos_of_lex[lex] = np.arange(tl)
        for lo in range(0, tl, chunk):
            hi = min(lo + chunk, tl)
            h = mult @ inc[lo:hi].T.astype(np.float32)  # (NQ, chunk)
            p = h >= need[:, None]
            pass_terms += p.sum(axis=1)
            for name, pos in (("build", np.arange(lo, hi)),
                              ("lex", pos_of_lex[lo:hi])):
                blk_ids = pos // BLK
                nb = tl // BLK + 1
                for r in range(NQ):
                    if p[r].any():
                        bb = np.unique(blk_ids[p[r]])
                        pass_blocks[name][r] += bb.size
        true_pass[th] = (pass_terms, pass_blocks)
        log(f"th={th}: true passing terms/query mean="
            f"{pass_terms.mean():.1f} p90={np.percentile(pass_terms, 90):.0f}"
            f" | true blocks build={pass_blocks['build'].mean():.1f}"
            f" lex={pass_blocks['lex'].mean():.1f}")

    # block unions under each order -> coarse bound pass counts
    for name, order in (("build", np.arange(tl)), ("lex", lex)):
        inc_o = inc[order]
        nb = (tl + BLK - 1) // BLK
        pad = nb * BLK - tl
        if pad:
            inc_o = np.vstack([inc_o, np.zeros((pad, G), bool)])
        uni = inc_o.reshape(nb, BLK, G).any(axis=1)  # (nb, G)
        usize = uni.sum(axis=1)
        log(f"{name}: union grams/block mean={usize.mean():.0f} "
            f"p50={np.percentile(usize, 50):.0f} "
            f"p90={np.percentile(usize, 90):.0f} of G={G}")
        bound = mult @ uni.T.astype(np.float32)  # (NQ, nb)
        for th in (0.3, 0.5):
            passing = (bound >= (th * nqg)[:, None]).sum(axis=1)
            log(f"  th={th}: coarse-passing blocks/query "
                f"mean={passing.mean():.0f} "
                f"p50={np.percentile(passing, 50):.0f} "
                f"p90={np.percentile(passing, 90):.0f} of {nb}")


if __name__ == "__main__":
    main()
