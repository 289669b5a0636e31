"""Unit tests for experimental/tree_descend.supertile_descend against a per-tile
brute-force reference of the same accept/open semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.experimental.tree_descend import supertile_descend


def _hash01(*args):
    h = np.uint64(1469598103934665603)
    for a in args:
        h = (h ^ np.uint64(a)) * np.uint64(1099511628211)
    return float(h % np.uint64(1000)) / 1000.0


def make_tables(T, C0, nbranch, levels, G, p_accept=0.45, p_alive=0.8):
    """Deterministic pseudo-random alive/accept tables per level."""
    alive, accept = {}, {}
    for r in range(1, levels + 1):
        Kc = C0 * nbranch ** r
        alive[r] = np.array(
            [_hash01(7, r, i) < p_alive for i in range(Kc)], bool)
        accept[r] = np.array(
            [[_hash01(13, r, t, i) < p_accept for i in range(Kc)]
             for t in range(T)], bool)
    return alive, accept


def reference_descend(open0, nbranch, levels, alive, accept):
    """Per-tile recursive walk: returns (monos, finals) where monos is a
    set of (r, id, tile) and finals a set of (id, tile)."""
    T, C0 = open0.shape
    monos, finals = set(), set()
    for t in range(T):
        frontier = [i for i in range(C0) if open0[t, i]]
        for r in range(1, levels + 1):
            nxt = []
            for p in frontier:
                for j in range(nbranch):
                    c = p * nbranch + j
                    if not alive[r][c]:
                        continue
                    if accept[r][t, c]:
                        monos.add((r, c, t))
                    else:
                        nxt.append(c)
            frontier = nxt
        finals.update((i, t) for i in frontier)
    return monos, finals


def run_module(open0, nbranch, levels, G, alive, accept, caps=256):
    T, C0 = open0.shape
    Ts = -(-T // G)

    def mac_fn(r, ids):
        idn = np.asarray(ids)
        Kc = idn.shape[1]
        idc = np.clip(idn, 0, alive[r].shape[0] - 1)
        al = alive[r][idc]
        acc = np.zeros((Ts, G, Kc), bool)
        for s in range(Ts):
            for g in range(G):
                t = s * G + g
                if t < T:
                    acc[s, g] = accept[r][t][idc[s]]
        return {"accept": jnp.asarray(acc), "alive": jnp.asarray(al)}

    def mono_fn(r, ids):
        idn = np.asarray(ids).astype(np.float64)
        mass = 1.0 + idn + 100.0 * r
        com = np.stack([mass * 2.0, mass * 3.0], axis=-1)
        return jnp.asarray(mass, jnp.float32), jnp.asarray(com, jnp.float32)

    return supertile_descend(
        jnp.asarray(open0), nbranch, levels, G,
        k0=caps, k_caps=[caps] * levels, m_caps=[caps] * levels,
        mac_fn=mac_fn, mono_fn=mono_fn)


@pytest.mark.parametrize("nbranch,levels,G,T,C0", [
    (2, 3, 4, 10, 16),
    (4, 2, 2, 7, 16),
    (8, 2, 8, 9, 8),
])
def test_descend_matches_reference(nbranch, levels, G, T, C0):
    open0 = np.array(
        [[_hash01(3, t, i) < 0.3 for i in range(C0)] for t in range(T)], bool)
    alive, accept = make_tables(T, C0, nbranch, levels, G)
    res = run_module(open0, nbranch, levels, G, alive, accept)
    monos_ref, finals_ref = reference_descend(
        open0, nbranch, levels, alive, accept)

    assert not np.asarray(res.overflow).any()

    # reconstruct (r, id, tile) monopole triples from the level-concat
    # (part widths follow _compact's min(cap, list width) slicing)
    Ts = -(-T // G)
    caps = 256
    widths, K = [], min(caps, C0)
    for _ in range(levels):
        Kc = K * nbranch
        widths.append(min(caps, Kc))
        K = min(caps, Kc)
    r_of_k = np.concatenate(
        [np.full(w, r + 1) for r, w in enumerate(widths)])
    mm = np.asarray(res.mono_mass)
    cm = np.asarray(res.mono_com)
    mk = np.asarray(res.mono_mask)
    got = set()
    for s in range(Ts):
        for k in range(mm.shape[1]):
            r = int(r_of_k[k])
            if mm[s, k] <= 0:
                continue
            nid = round(mm[s, k] - 100.0 * r - 1.0)
            assert cm[s, k, 0] == pytest.approx(mm[s, k] * 2.0)
            for g in range(G):
                t = s * G + g
                if t < T and mk[t, k] > 0:
                    got.add((r, nid, t))
    assert got == monos_ref

    fin = set()
    fids = np.asarray(res.final_ids)
    fbits = np.asarray(res.final_bits)
    fval = np.asarray(res.final_valid)
    for s in range(Ts):
        for k in range(fids.shape[1]):
            if not fval[s, k]:
                continue
            for g in range(G):
                t = s * G + g
                if t < T and (fbits[s, k] >> g) & 1:
                    fin.add((int(fids[s, k]), t))
    assert fin == finals_ref


def test_descend_overflow_flags():
    nbranch, levels, G, T, C0 = 2, 2, 2, 4, 8
    open0 = np.ones((T, C0), bool)
    alive, accept = make_tables(T, C0, nbranch, levels, G,
                                p_accept=0.0, p_alive=1.0)
    res = run_module(open0, nbranch, levels, G, alive, accept, caps=4)
    # every node stays open: k0=4 < 8 opens -> every member overflows
    assert np.asarray(res.overflow)[:T].all()
