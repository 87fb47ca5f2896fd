"""Microbenchmark: stride-2 ConvTranspose as input-dilated conv (current)
vs subpixel decomposition (4 phase convs + depth-to-space interleave).

Hypothesis: XLA lowers lhs_dilation=2 convs with ~75% wasted MACs on the
inserted zeros; splitting the 5x5/s2 ConvT into its 4 output-parity phases
(3x3 + 3x2 + 2x3 + 2x2 taps) does only the useful work on the MXU.

Run on the TPU:  python benchmarks/convt_micro.py
"""

from __future__ import annotations

import time

import numpy as np


def dilated_convt(x, w, out_pad=1):
    """Current TorchConvTranspose lowering: k=5, s=2, p=2, op=1 (NHWC/HWIO)."""
    import jax.numpy as jnp
    from jax import lax
    pad_lo, pad_hi = 5 - 1 - 2, 5 - 1 - 2 + out_pad
    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def subpixel_convt(x, w):
    """Same math, decomposed by output-pixel parity.

    out[2i+a, 2j+b] = sum_{m,n} xpad[i+m, j+n] * w_phase[a,b][m,n]
    where xpad pads x by 1 on the low side and w_phase[a,b] collects kernel
    taps w[u, v] with u = 2m + ((a+1) mod 2)... derived below numerically.
    """
    import jax.numpy as jnp
    from jax import lax
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    # output y[oh, ow] = sum_{u,v} xd[oh + u', ...]: derive per-phase taps
    # from the dilated formulation: dilated input index d = oh - 2 + u must
    # be even and map to input index d/2 in [0, H).
    outs = {}
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # input idx range [-1, H]
    for a in (0, 1):
        for b in (0, 1):
            # oh = 2i + a: input row index r = (oh - 2 + u)/2 for u with
            # (a + u) even; u in 0..4 → r - i = (a + u - 2)/2 in {-1, 0, 1}
            us = [u for u in range(5) if (a + u) % 2 == 0]
            vs = [v for v in range(5) if (b + v) % 2 == 0]
            # taps offsets in padded input coords: i + (u + a - 2)//2 + 1
            wsub = w[jnp.asarray(us)[:, None], jnp.asarray(vs)[None, :]]
            # flip? conv_general_dilated does correlation; the dilated form
            # also does correlation, so taps keep orientation. Offsets:
            # tap offsets relative to i, in PADDED coords (+1)
            ro = [(u + a - 2) // 2 + 1 for u in us]
            co = [(v + b - 2) // 2 + 1 for v in vs]
            lo_r, hi_r = min(ro), max(ro)
            lo_c, hi_c = min(co), max(co)
            xs = lax.slice(
                xp, (0, lo_r, lo_c, 0),
                (B, lo_r + H + (hi_r - lo_r), lo_c + W + (hi_c - lo_c), Cin))
            y = lax.conv_general_dilated(
                xs, wsub, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs[(a, b)] = y
    # interleave: (B, H, W, 2, 2, C) -> (B, 2H, 2W, C)
    row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)  # (B,H,W,2,C)
    row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    y = jnp.stack([row0, row1], axis=2)  # (B, H, 2, W, 2, C)
    y = y.reshape(B, 2 * H, 2 * W, Cout)
    return y


def main():
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, K = 256, 32  # K steps per dispatch (tunnel RPC >> kernel time)

    def timed_scan(op, xs, w):
        """One dispatch running op over K distinct inputs inside lax.scan;
        returns seconds per op call."""
        @jax.jit
        def run(xs, w):
            def body(acc, x):
                y = op(x, w)
                return acc + jnp.sum(y.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc

        float(run(xs, w))  # compile + warm
        t0 = time.perf_counter()
        v = float(run(xs, w))  # value fetch = reliable sync on axon
        assert v == v
        return (time.perf_counter() - t0) / K

    shapes = [  # decoder ladder at batch 256 (vae.py): (H, Cin, Cout)
        (8, 256, 256),
        (16, 256, 128),
        (32, 128, 32),
    ]
    for H, Cin, Cout in shapes:
        xs = jax.random.normal(jax.random.key(0), (K, B, H, H, Cin),
                               jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (5, 5, Cin, Cout),
                              jnp.bfloat16)

        a = np.asarray(jax.jit(dilated_convt)(xs[0], w), np.float32)
        b = np.asarray(jax.jit(subpixel_convt)(xs[0], w), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f"H={H} Cin={Cin} Cout={Cout}: rel err {err:.2e}")

        gf = 2 * B * (2 * H) ** 2 * 25 / 4 * Cin * Cout / 1e9  # useful FLOPs
        for name, op in [("dilated ", dilated_convt),
                         ("subpixel", subpixel_convt)]:
            dt = timed_scan(op, xs, w)
            print(f"  {name} fwd    : {dt*1e3:7.3f} ms  "
                  f"({gf/dt/1000:.1f} useful TF/s)")

        for name, op in [("dilated ", dilated_convt),
                         ("subpixel", subpixel_convt)]:
            def fb(x, w, op=op):
                gx, gw = jax.grad(lambda x, w: jnp.sum(
                    op(x, w).astype(jnp.float32)), argnums=(0, 1))(x, w)
                return gx + 0 * x  # shape-preserving result for scan sum
            dt = timed_scan(fb, xs, w)
            print(f"  {name} fwd+bwd: {dt*1e3:7.3f} ms  "
                  f"({3*gf/dt/1000:.1f} useful TF/s)")


if __name__ == "__main__":
    main()
