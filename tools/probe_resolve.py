"""Isolated A/B of binned-resolve formulations at representative shapes
(ng=256K groups, pcap, g=8, ~1M pairs). The r5 stage profile measured the
resolve at ~97 ms regardless of scatter form (2-D column scatter == 8x
1-D scatter-min), so this probes each candidate end-to-end with runtime
operands (CLAUDE.md microbench trap: constants fold away):

  colscat : [g, ng*pcap+1].at[:, ppid].set(rows_t)      (r5 original)
  smin    : per-row 1-D .at[ppid].min                   (r5 second try)
  posgath : 1-D pos invert + pcap row-gathers from [nbins, 128]
            + mask-fold min (no big scatter)
  sortinv : g 1-D dst-gathers + one (pid, vals...) full sort back to
            emit order + reshape-min
  split   : smin minus the argmin/leaf_w recovery (isolates min vs argmin)

python tools/probe_resolve.py [--ng=262144] [--pcap=16] [--g=8] [--cpu]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stratum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

_MISS = 0x7F800000


def main():
    from stratum_tpu.utils.flags import Options

    opts = Options(sys.argv[1:])
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    if opts.has("cpu"):
        jax.config.update("jax_platforms", "cpu")

    ng = opts.get_int("ng", 262144)
    pcap = opts.get_int("pcap", 16)
    g = opts.get_int("g", 8)
    bw = 128 // g
    rng = np.random.default_rng(3)
    # representative pair population: ~4 pairs/group, padded to 1.2M
    count = np.minimum(rng.poisson(4.0, ng), pcap).astype(np.int32)
    npairs = int(count.sum())
    mpad = (npairs // bw + ng // 64 + 64) // 64 * 64 * bw  # run padding slop
    # emit pids of the valid pairs, assigned to padded positions in a
    # run-ish order (randomized is the worst case for locality)
    pid_valid = np.concatenate(
        [gi * pcap + np.arange(c) for gi, c in enumerate(count)]
    ).astype(np.int32)
    pos_assign = np.sort(
        rng.choice(mpad, size=npairs, replace=False)
    ).astype(np.int32)
    ppid_np = np.full((mpad,), ng * pcap, np.int32)
    ppid_np[pos_assign] = pid_valid
    binout_np = rng.integers(
        0, _MISS, size=(mpad // bw, 128), dtype=np.int32
    )
    ppid = jnp.asarray(ppid_np)
    binout = jnp.asarray(binout_np)
    slots = jnp.asarray(
        rng.integers(0, 700, size=(ng, pcap), dtype=np.int32)
    )
    # dst/spid view for sortinv: dst[i] = padded position of sorted pair i
    dst_np = pos_assign  # [npairs] ascending
    spid_np = pid_valid
    mcap = ng * pcap
    dstf = np.full((mcap,), mpad, np.int32)
    dstf[: len(dst_np)] = dst_np
    spidf = np.full((mcap,), mcap, np.int32)
    spidf[: len(spid_np)] = spid_np
    dst = jnp.asarray(dstf)
    spid = jnp.asarray(spidf)
    print(
        f"ng={ng} pcap={pcap} g={g} pairs={npairs/1e6:.2f}M "
        f"mpad={mpad/1e6:.2f}M",
        flush=True,
    )

    def rows_t_of(binout):
        return jnp.transpose(
            binout.reshape(mpad // bw, bw, g), (2, 0, 1)
        ).reshape(g, mpad)

    def leafw(wp):
        lw = jnp.full((g, ng), -1, jnp.int32)
        for pp in range(pcap):
            lw = jnp.where(wp == pp, slots[:, pp][None, :], lw)
        return lw

    def colscat(binout, ppid):
        rows_t = rows_t_of(binout)
        res_t = jnp.full((g, ng * pcap + 1), _MISS, jnp.int32).at[
            :, ppid
        ].set(rows_t, mode="drop")[:, : ng * pcap]
        res3 = res_t.reshape(g, ng, pcap)
        return jnp.min(res3, axis=2), leafw(jnp.argmin(res3, axis=2))

    def smin(binout, ppid):
        rows_t = rows_t_of(binout)
        pm, wp = [], []
        for r in range(g):
            res_r = (
                jnp.full((ng * pcap + 1,), _MISS, jnp.int32)
                .at[ppid].min(rows_t[r], mode="drop")[: ng * pcap]
                .reshape(ng, pcap)
            )
            pm.append(jnp.min(res_r, axis=1))
            wp.append(jnp.argmin(res_r, axis=1))
        return jnp.stack(pm), leafw(jnp.stack(wp))

    def split(binout, ppid):
        """smin without argmin/leaf_w — prices the winner recovery."""
        rows_t = rows_t_of(binout)
        pm = []
        for r in range(g):
            res_r = (
                jnp.full((ng * pcap + 1,), _MISS, jnp.int32)
                .at[ppid].min(rows_t[r], mode="drop")[: ng * pcap]
                .reshape(ng, pcap)
            )
            pm.append(jnp.min(res_r, axis=1))
        return jnp.stack(pm), jnp.zeros((g, ng), jnp.int32)

    def posgath(binout, ppid):
        rows128 = binout  # [nbins, 128]
        idx = jnp.arange(mpad, dtype=jnp.int32)
        pos = (
            jnp.full((ng * pcap + 1,), mpad, jnp.int32)
            .at[ppid].set(idx, mode="drop")[: ng * pcap]
            .reshape(ng, pcap)
        )
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc = jnp.full((g, ng), _MISS, jnp.int32)
        wp = jnp.zeros((g, ng), jnp.int32)
        for pp in range(pcap):
            p = pos[:, pp]
            valid = p < mpad
            rows = rows128[jnp.minimum(p, mpad // bw * bw - 1) // bw]
            off = p % bw
            m = (lane // g) == off[:, None]
            masked = jnp.where(m & valid[:, None], rows, _MISS)
            folded = jnp.min(
                masked.reshape(ng, bw, g), axis=1
            ).T  # [g, ng]
            closer = folded < acc
            acc = jnp.where(closer, folded, acc)
            wp = jnp.where(closer, pp, wp)
        return acc, leafw(wp)

    def sortinv(binout, ppid_unused):
        rows_t = rows_t_of(binout)
        vals = [rows_t[r][jnp.minimum(dst, mpad - 1)] for r in range(g)]
        vals = [
            jnp.where(dst < mpad, v, _MISS) for v in vals
        ]
        srt = lax.sort((spid,) + tuple(vals), num_keys=1)
        pm, wp = [], []
        for r in range(g):
            res_r = srt[1 + r][: ng * pcap].reshape(ng, pcap)
            pm.append(jnp.min(res_r, axis=1))
            wp.append(jnp.argmin(res_r, axis=1))
        return jnp.stack(pm), leafw(jnp.stack(wp))

    def direct(binout, ppid):
        """Occlusion-style: scatter-min straight into the per-ray table
        (no leaf recovery — enough for any-hit; prices the no-pcap-table
        path)."""
        rows_t = rows_t_of(binout)
        grp = jnp.minimum(ppid // pcap, ng - 1)
        ok = ppid < ng * pcap
        out = []
        for r in range(g):
            out.append(
                jnp.full((ng + 1,), _MISS, jnp.int32)
                .at[jnp.where(ok, grp, ng)]
                .min(rows_t[r], mode="drop")[:ng]
            )
        return jnp.stack(out), jnp.zeros((g, ng), jnp.int32)

    def dilate2sort(binout, ppid):
        """Bounded segment-min by log2(pcap) dilation passes in ppid-sorted
        order + a compaction sort that lands one answer per group, aligned.
        Row-granular ops only (two multi-operand sorts + shifts)."""
        rows_t = rows_t_of(binout)
        # one dummy entry per group guarantees every group a segment
        grp_pairs = jnp.minimum(ppid // pcap, ng)  # invalid -> ng
        key1 = jnp.where(ppid < ng * pcap, grp_pairs, ng)
        keys = jnp.concatenate(
            [key1, jnp.arange(ng, dtype=jnp.int32)]
        )
        ops = [
            jnp.concatenate(
                [rows_t[r], jnp.full((ng,), _MISS, jnp.int32)]
            )
            for r in range(g)
        ]
        srt = lax.sort((keys,) + tuple(ops), num_keys=1)
        sk = srt[0]
        vals = list(srt[1:])
        m = sk.shape[0]
        pc2 = 1
        while pc2 < pcap + 1:
            pc2 *= 2
        sh = 1
        while sh < pc2:
            same = jnp.concatenate(
                [sk[sh:] == sk[:-sh], jnp.zeros((sh,), bool)]
            )
            for r in range(g):
                shifted = jnp.concatenate(
                    [vals[r][sh:], jnp.full((sh,), _MISS, jnp.int32)]
                )
                vals[r] = jnp.where(
                    same, jnp.minimum(vals[r], shifted), vals[r]
                )
            sh *= 2
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
        ) & (sk < ng)
        key2 = jnp.where(first, sk, ng + 1)
        srt2 = lax.sort((key2,) + tuple(vals), num_keys=1)
        return jnp.stack([v[:ng] for v in srt2[1:]]), jnp.zeros(
            (g, ng), jnp.int32
        )

    variants = dict(
        colscat=colscat, smin=smin, split=split, posgath=posgath,
        sortinv=sortinv, direct=direct, dilate2sort=dilate2sort,
    )
    for name, fn in variants.items():
        f = jax.jit(fn)
        r = f(binout, ppid)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(5):
            r = f(binout, ppid)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 5 * 1e3
        print(f"  {name:8s}: {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
