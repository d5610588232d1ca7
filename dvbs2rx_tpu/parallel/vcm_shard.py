"""Channel-mesh SPMD wrapper for the device-resident VCM stream engine
(VERDICT r4 item 5: the scale-out story must cover variable-MODCOD
streams; the reference runs one hot chain for all PLS,
``lib/plsync_cc_impl.cc:144-147``).

Design: ``shard_map`` over a ``("ch",)`` mesh, C channels split evenly.
Everything in the VCM step is channel-parallel EXCEPT the pooled per-PLS
FEC queues, which in the single-device engine pool frames across all
channels. Pooling across devices would drag every frame through a
cross-device collective in the hot loop, so the sharded engine pools
per-shard instead: each device owns (S, n_ldpc, CAP) queues for ITS
channels and drains its own ``B_fec``-lane batches — the Pallas LDPC
kernel runs unmodified per device, decode throughput scales linearly,
and no collective ever touches the FEC path. Per-lane convergence
freezing (ops/ldpc.py) makes each frame's decode independent of batch
composition, so per-frame outputs match the unsharded engine
bit-for-bit; only drain cadence (which step a frame pops out of) and the
refined-N0 batch statistics differ.

State layout: channel-led arrays keep their global (C, ...) shape and
shard on axis 0; queue arrays gain a leading device axis
(D, S, ...) sharded on axis 0. ``init_state_np``/``shard_state`` build
and place it; ``prime`` reuses the unsharded receiver's acquisition
(one-time, host-orchestrated) and re-lays the result out.

Interface differences vs ``VCMStreamReceiver.step``: outputs concatenate
the per-shard drains (``DRAIN = D * DRAIN_local`` slots per PLS, meta
carries GLOBAL channel ids) and whole-step scalar stats (frames,
dummies, rejected, ldpc_iters) come back as per-shard (D,) vectors —
sum on the host.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..rx.vcm_stream import VCMStreamReceiver
from ..utils.runtime import fec_jit

_QKEYS = ("qllr", "qmeta", "qxf", "qfill")


class ShardedVCMStreamReceiver:
    """``VCMStreamReceiver`` over a channel mesh (see module docstring)."""

    def __init__(self, cfg, n_channels: int, mesh: Mesh,
                 frames_per_step: int = 2, fec_lanes: int = None,
                 allow_dummy: bool = True):
        D = mesh.shape["ch"]
        if n_channels % D:
            raise ValueError(
                f"n_channels={n_channels} not divisible by mesh size {D}"
            )
        self.cfg = cfg
        self.mesh = mesh
        self.D = D
        self.n_channels = n_channels
        self._ctor = (cfg, frames_per_step, fec_lanes, allow_dummy)
        loc = self.local = VCMStreamReceiver(
            cfg, n_channels // D, frames_per_step=frames_per_step,
            fec_lanes=fec_lanes, allow_dummy=allow_dummy,
        )
        self.S, self.B_fec = loc.S, loc.B_fec
        self.DRAIN = D * loc.DRAIN
        self.n_in, self._n_fe = loc.n_in, loc._n_fe
        self._full = None                     # lazy: prime-only receiver

        C_loc = loc.n_channels
        sa, sbs = loc._build_step()

        tmpl = loc.init_state_np()
        self._state_specs = {
            k: P("ch", *([None] * (v.ndim if k in _QKEYS else v.ndim - 1)))
            for k, v in tmpl.items()
        }

        def unsq(st):
            return {k: (st[k][0] if k in _QKEYS else st[k]) for k in st}

        def sq(st):
            return {k: (st[k][None] if k in _QKEYS else st[k]) for k in st}

        def step_a_local(state, iq):
            st2, llr8, xf8, meta, sels, stats = sa(unsq(state), iq)
            stats = {
                k: (v[None] if getattr(v, "ndim", 0) == 0 else v)
                for k, v in stats.items()
            }
            return sq(st2), llr8, xf8, meta, sels, stats

        tmpl_local = {
            k: (v[None] if k in _QKEYS else v) for k, v in tmpl.items()
        }
        stats_shapes = jax.eval_shape(
            step_a_local, tmpl_local,
            jax.ShapeDtypeStruct((C_loc, loc.n_in, 2), jnp.float32),
        )[5]
        stats_specs = jax.tree.map(
            lambda v: P("ch", *([None] * (v.ndim - 1))), stats_shapes
        )
        self._step_a = fec_jit(
            shard_map(
                step_a_local, mesh=mesh, check_vma=False,
                in_specs=(self._state_specs, P("ch", None, None)),
                out_specs=(self._state_specs, P(None, "ch"), P(None, "ch"),
                           P("ch", None), P(None, "ch"), stats_specs),
            ),
            donate_argnums=0,
        )

        def make_b(sb):
            def body(state, llr8, xf8, meta, sels):
                st2, out, stats_b = sb(unsq(state), llr8, xf8, meta, sels)
                off = jax.lax.axis_index("ch") * C_loc
                out = dict(out, meta=out["meta"].at[:, :, 0].add(off))
                stats_b = dict(
                    stats_b, ldpc_iters=stats_b["ldpc_iters"][None]
                )
                return sq(st2), out, stats_b
            return body

        out_specs_b = (
            self._state_specs,
            {"kb": P("ch", None, None), "meta": P("ch", None, None),
             "n_corr": P("ch", None), "fired": P("ch")},
            {"ldpc_iters": P("ch"), "n0_refined": P("ch", None)},
        )
        self._step_b = [
            fec_jit(
                shard_map(
                    make_b(sb), mesh=mesh, check_vma=False,
                    in_specs=(self._state_specs, P(None, "ch"),
                              P(None, "ch"), P("ch", None), P(None, "ch")),
                    out_specs=out_specs_b,
                ),
                donate_argnums=0,
            )
            for sb in sbs
        ]

    # ---------------- state ----------------

    def init_state_np(self):
        g = {}
        for k, v in self.local.init_state_np().items():
            if k in _QKEYS:
                g[k] = np.zeros((self.D,) + v.shape, v.dtype)
            else:
                g[k] = np.zeros((self.n_channels,) + v.shape[1:], v.dtype)
        return g

    def shard_state(self, state_np):
        return {
            k: jax.device_put(
                v, NamedSharding(self.mesh, self._state_specs[k])
            )
            for k, v in state_np.items()
        }

    def prime(self, iq_prefix: np.ndarray, strict: bool = True):
        """One-time host-orchestrated acquisition: run the unsharded
        receiver's prime at full C, then re-lay the state out sharded."""
        if self._full is None:
            cfg, F, lanes, dummy = self._ctor
            self._full = VCMStreamReceiver(
                cfg, self.n_channels, frames_per_step=F, fec_lanes=lanes,
                allow_dummy=dummy,
            )  # its step jits are never invoked
        st = self._full.prime(iq_prefix, strict=strict)
        self.prime_ok = self._full.prime_ok
        g = self.init_state_np()
        for k, v in st.items():
            if k not in _QKEYS:
                g[k] = np.asarray(v)
        return self.shard_state(g)

    # ---------------- the step ----------------

    def step(self, state, iq):
        """Sharded step; same contract as ``VCMStreamReceiver.step`` with
        the layout differences in the module docstring."""
        state, llr8, xf8, meta, sels, stats = self._step_a(state, iq)
        outputs = {"kb": [], "meta": [], "n_corr": [], "fired": []}
        iters = []
        for fn in self._step_b:
            state, o, stats_b = fn(state, llr8, xf8, meta, sels)
            for k in outputs:
                outputs[k].append(o[k])
            iters.append(stats_b["ldpc_iters"])
        stats = {**stats, "ldpc_iters": iters,
                 "n0_refined": stats_b["n0_refined"]}
        return state, outputs, stats
