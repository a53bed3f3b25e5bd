"""Sharded Monte-Carlo execution + SNR x channel sweep driver.

`ShardedLinkRunner` maps the per-chunk hot path (`LinkRunner._chunk_fn`,
i.e. the fused Pallas kernel when supported, the XLA chunk_body otherwise)
over a device mesh with `shard_map`: each device simulates an independent
slice of the OFDM-symbol batch with its own fold_in'd PRNG stream and its
own convolution stream
(SURVEY §7.2 step 7: per-shard independent streams are statistically
identical to one long stream and avoid halo exchange; the cross-chunk carry
*within* each shard still makes every shard's stream exactly contiguous).
The only collectives are:

  * `psum`/`pmax` of the error/PAPR counters — once per run on the fused
    path (the chunk scan lives inside shard_map; see
    `_build_shard_pallas_scan`), per chunk on fallbacks, and
  * on the XLA body only, `pmean` of the measured post-channel power (so
    AWGN scaling matches the reference's global measurement,
    noise/models.py:14-16; the fused kernel measures per tile).

Both ride ICI within a slice / DCN across hosts; there is no parameter
traffic in this workload (SURVEY §2.12).

`run_sweep` drives a full SNR x channel grid (the reference's
`SimulationRunner.run_all`, main.py:217-249) with CSV-upsert-compatible
result checkpointing so an interrupted grid resumes (SURVEY §5
checkpoint/resume).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ofdm_tpu.config import SimulationConfig
from ofdm_tpu.ops import cplx
from ofdm_tpu.parallel.mesh import MC_AXIS, make_mesh
from ofdm_tpu.pipeline import LinkRunner, LinkSetup, prepare, run_grid_multi, _acc_add, _acc_init

# Shared executables for the sharded fused-kernel path, keyed on
# (kernel spec, mesh, chunk layout) — mirrors pipeline._SHARED_JIT so a
# sharded SNR x channel sweep also compiles once.
_SHARED_SHARD_JIT: Dict[Any, Any] = {}


class ShardedLinkRunner(LinkRunner):
    """LinkRunner whose chunks shard the OFDM-symbol batch over a mesh.

    ``num_ofdm_symbols`` and chunk sizes are GLOBAL; each device runs
    ``global/num_devices`` symbols per chunk.  Error counts returned are
    global (psum'd).  Requires the batch to divide evenly.
    """

    def __init__(
        self,
        setup: LinkSetup,
        mesh: Optional[Mesh] = None,
        stream_mode: str = "independent",
    ):
        """``stream_mode``:

        * ``"independent"`` (default) — each shard runs its own contiguous
          convolution stream (statistically identical to one long stream,
          SURVEY §7.2 step 7; keeps the fused Pallas kernel hot path).
        * ``"halo"`` — the sharded batch is ONE contiguous shard-major
          stream; the convolution carry crosses shard boundaries via
          ppermute (parallel.halo), making the sharded convolution
          bit-exact vs an unsharded run of the same stream.  Keeps the
          fused kernel: ISI-carrying modes exchange a probe-reproduced
          carry row before each chunk (`_halo_kernel_step`); ISI-free
          diag links need no exchange (vestigial carry).  Configs off
          the kernel path run the XLA chunk body with the same ppermute.
        """
        super().__init__(setup)
        if stream_mode not in ("independent", "halo"):
            raise ValueError(f"unknown stream_mode: {stream_mode!r}")
        self.stream_mode = stream_mode
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size

    def _shard_chunk(self, num_syms_global: int, return_symbols: bool):
        """Build the shard_map'd chunk function for a global chunk size."""
        if num_syms_global % self.n_dev != 0:
            raise ValueError(
                f"chunk of {num_syms_global} OFDM symbols not divisible by "
                f"{self.n_dev} devices"
            )
        local = num_syms_global // self.n_dev
        # Per-shard body via _chunk_fn: prefers the fused Pallas kernel
        # (per-device chunk is kept a tile multiple by run()'s rounding via
        # _pallas_chunk_multiple) so multi-chip keeps the single-chip
        # per-chip throughput; falls back to the XLA chunk_body with a
        # pmean'd global AWGN power measurement.  This _shard_chunk builder
        # is the NON-lifted fallback only: stream_mode="halo" here takes
        # the XLA body with the ppermute carry exchange (every shard's
        # carry slot holds the same replicated global carry); kernel-path
        # halo runs go through _shard_lifted/_halo_kernel_step instead.
        if self.stream_mode == "halo":
            body = lambda key, carry, snr_db, sqrt_power: self.chunk_body(  # noqa: E731
                key, carry, local, return_symbols,
                snr_db=snr_db, sqrt_power=sqrt_power,
                axis_name=MC_AXIS, halo_axis=MC_AXIS,
            )
        else:
            body = self._chunk_fn(local, return_symbols, axis_name=MC_AXIS)

        def fn(key, carry, snr_db, sqrt_power):
            # carry: per-shard (n_dev, K-1) complex-ish, stacked on axis 0.
            idx = jax.lax.axis_index(MC_AXIS)
            k = jax.random.fold_in(key, idx)
            stats, new_carry = body(k, carry[0], snr_db, sqrt_power)
            stats["bit_errors"] = jax.lax.psum(stats["bit_errors"], MC_AXIS)
            stats["symbol_errors"] = jax.lax.psum(stats["symbol_errors"], MC_AXIS)
            stats["papr_peak"] = jax.lax.pmax(stats["papr_peak"], MC_AXIS)
            stats["papr_sum"] = jax.lax.psum(stats["papr_sum"], MC_AXIS)
            stats["papr_count"] = jax.lax.psum(stats["papr_count"], MC_AXIS)
            new_carry = jax.tree.map(lambda a: a[None], new_carry)
            return stats, new_carry

        carry_spec = jax.tree.map(lambda _: P(MC_AXIS), self._init_carry_sharded())
        out_stats_spec: Dict[str, Any] = {
            "bit_errors": P(),
            "symbol_errors": P(),
            "papr_peak": P(),
            "papr_sum": P(),
            "papr_count": P(),
        }
        if return_symbols:
            # Shards concatenate along the batch axis into one global array.
            out_stats_spec["received_symbols"] = (
                cplx.CArray(P(MC_AXIS), P(MC_AXIS)) if self.planar else P(MC_AXIS)
            )
        return shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(), carry_spec, P(), P()),
            out_specs=(out_stats_spec, carry_spec),
            # Pallas PRNG kernels inside the body have no vma annotations;
            # skip the varying-mesh-axes check (counters are psum'd manually).
            check_vma=False,
        ), local

    def _init_carry_sharded(self):
        base = super()._init_carry()
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (self.n_dev,) + a.shape), base
        )

    def _shard_lifted(self, num_syms_global: int):
        """Shared-executable sharded chunk: (fn, consts, spec, local, probe).

        ``probe`` is None in independent mode.  In halo mode it is the
        (probe_fn, probe_consts) pair from pallas_link.make_carry_probe —
        the kernel's carry out is a pure function of the shard's PRNG
        stream, so each shard's halo row is computed and ppermuted BEFORE
        the chunk kernel runs (`_halo_kernel_step`), keeping the fused
        kernel under exact contiguous-stream sharding.  Returns None when
        the kernel (or, in halo mode, the probe) is unavailable."""
        if num_syms_global % self.n_dev != 0:
            return None
        local = num_syms_global // self.n_dev
        lifted = self._lifted(local)
        if lifted is None:
            return None
        fn, consts, spec = lifted
        probe = None
        if self.stream_mode == "halo" and spec.conv != "diag":
            # Diag links have a vestigial carry (no ISI path consumes it):
            # the fused kernel needs no probe/exchange and the independent
            # wiring is bit-identical to the chained stream, so probe stays
            # None there by design (tests pin equality vs independent mode).
            from ofdm_tpu.ops import pallas_link

            probe = pallas_link.make_carry_probe(
                self, local, interpret=self._interpret
            )
            if probe is None:
                return None
        return fn, consts, spec, local, probe

    @staticmethod
    def _halo_kernel_step(fn, pfn, k, carry_local, snr_db, sqrt_power, consts, pconsts):
        """One halo-mode fused-kernel chunk: probe -> ppermute -> kernel.

        The shard-major stream's ISI chain stays contiguous: shard d's
        first row consumes shard d-1's chunk-final TX row (shard 0: the
        previous chunk's global carry), bit-exactly — the probe reproduces
        the kernel's carry out (tests pin equality), so the exchanged row
        IS the row the unsharded chain would use.  Collectives per chunk:
        one (T,)-row ppermute + one masked-psum broadcast, riding ICI."""
        from ofdm_tpu.parallel import halo

        last = pfn(k, sqrt_power, pconsts)
        recv, is0, _ = halo._neighbor_shift(last, MC_AXIS)
        carry_in = cplx.where(is0, carry_local, recv)
        stats, _own = fn(k, carry_in, snr_db, sqrt_power, consts)
        new_carry = halo._broadcast_from_shard0(recv, is0, MC_AXIS)
        return stats, new_carry

    def _build_shard_pallas(self, fn, consts_tree, probe=None):
        """shard_map the per-spec shared kernel fn, consts as replicated args.

        ``probe`` (halo mode): consts_tree is (consts, probe_consts) and
        each chunk runs probe -> ppermute -> kernel (`_halo_kernel_step`)."""
        pfn = None if probe is None else probe[0]

        def f(key, carry, snr_db, sqrt_power, consts):
            idx = jax.lax.axis_index(MC_AXIS)
            k = jax.random.fold_in(key, idx)
            if pfn is not None:
                consts_, pconsts = consts
                stats, new_carry = self._halo_kernel_step(
                    fn, pfn, k, carry[0], snr_db, sqrt_power, consts_, pconsts
                )
            else:
                stats, new_carry = fn(k, carry[0], snr_db, sqrt_power, consts)
            stats["bit_errors"] = jax.lax.psum(stats["bit_errors"], MC_AXIS)
            stats["symbol_errors"] = jax.lax.psum(stats["symbol_errors"], MC_AXIS)
            stats["papr_peak"] = jax.lax.pmax(stats["papr_peak"], MC_AXIS)
            stats["papr_sum"] = jax.lax.psum(stats["papr_sum"], MC_AXIS)
            stats["papr_count"] = jax.lax.psum(stats["papr_count"], MC_AXIS)
            new_carry = jax.tree.map(lambda a: a[None], new_carry)
            return stats, new_carry

        carry_spec = jax.tree.map(lambda _: P(MC_AXIS), self._init_carry_sharded())
        out_stats_spec: Dict[str, Any] = {
            "bit_errors": P(),
            "symbol_errors": P(),
            "papr_peak": P(),
            "papr_sum": P(),
            "papr_count": P(),
        }
        return shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(), carry_spec, P(), P(), jax.tree.map(lambda _: P(), consts_tree)),
            out_specs=(out_stats_spec, carry_spec),
            check_vma=False,
        )

    # Override the compiled step/scan builders to use the sharded chunk.
    def _step(self, num_syms: int, return_symbols: bool):
        if not return_symbols:
            lifted = self._shard_lifted(num_syms)
            if lifted is not None:
                fn, consts, spec, local, probe = lifted
                allconsts = consts if probe is None else (consts, probe[1])
                jkey = ("sstep", spec, self.mesh, self.stream_mode)
                j = _SHARED_SHARD_JIT.get(jkey)
                if j is None:
                    sm = self._build_shard_pallas(fn, allconsts, probe=probe)
                    j = _SHARED_SHARD_JIT.setdefault(jkey, jax.jit(sm))
                return lambda key, carry, snr, sp: j(key, carry, snr, sp, allconsts)
        key_ = ("sstep", num_syms, return_symbols)
        if key_ not in self._jitted:
            fn, _ = self._shard_chunk(num_syms, return_symbols)
            self._jitted[key_] = jax.jit(fn)
        return self._jitted[key_]

    def _build_shard_pallas_scan(self, fn, consts_tree, num_chunks: int, probe=None):
        """Whole-run shard_map: the chunk scan runs INSIDE the shard body.

        Collectives per RUN, not per chunk: the per-chunk scalar psums of the
        scan-around-shard_map formulation cost ~1 ms/chunk on the relay
        backend (measured: 53M vs 79M OFDM syms/s at 2^17-symbol chunks);
        here each shard scans its chunks locally and the stacked
        (num_chunks,) counters psum once at the end.  Per-chunk stats stay
        stacked so the host still accumulates totals in Python ints (int32
        counters never aggregate across chunks on-device)."""

        pfn = None if probe is None else probe[0]

        def f(key, carry, snr_db, sqrt_power, consts):
            idx = jax.lax.axis_index(MC_AXIS)
            if pfn is not None:
                consts, pconsts = consts

            def body(cs, i):
                # Same stream layout as the per-chunk formulation:
                # shard key = fold_in(fold_in(run_key, chunk), shard).
                c, acc = cs
                k = jax.random.fold_in(jax.random.fold_in(key, i), idx)
                if pfn is not None:
                    stats, c2 = self._halo_kernel_step(
                        fn, pfn, k, c, snr_db, sqrt_power, consts, pconsts
                    )
                else:
                    stats, c2 = fn(k, c, snr_db, sqrt_power, consts)
                return (c2, _acc_add(acc, stats)), None

            (carry2, acc), _ = jax.lax.scan(
                body, (carry[0], _acc_init()), jnp.arange(num_chunks)
            )
            # Exact cross-shard totals: the int32 lo/hi counter splits psum
            # losslessly (per-shard lo < 2^24, so even a 128-shard sum stays
            # far below 2^31; the host recombines hi*2^24 + lo).
            acc["be_lo"] = jax.lax.psum(acc["be_lo"], MC_AXIS)
            acc["be_hi"] = jax.lax.psum(acc["be_hi"], MC_AXIS)
            acc["se_lo"] = jax.lax.psum(acc["se_lo"], MC_AXIS)
            acc["se_hi"] = jax.lax.psum(acc["se_hi"], MC_AXIS)
            acc["papr_peak"] = jax.lax.pmax(acc["papr_peak"], MC_AXIS)
            acc["papr_sum"] = jax.lax.psum(acc["papr_sum"], MC_AXIS)
            acc["papr_sum_c"] = jax.lax.psum(acc["papr_sum_c"], MC_AXIS)
            acc["papr_count"] = jax.lax.psum(acc["papr_count"], MC_AXIS)
            acc["papr_count_c"] = jax.lax.psum(acc["papr_count_c"], MC_AXIS)
            return jax.tree.map(lambda a: a[None], carry2), acc

        carry_spec = jax.tree.map(lambda _: P(MC_AXIS), self._init_carry_sharded())
        out_stats_spec: Dict[str, Any] = {
            k: P() for k in (
                "be_lo", "be_hi", "se_lo", "se_hi", "papr_peak",
                "papr_sum", "papr_sum_c", "papr_count", "papr_count_c",
            )
        }
        return shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(), carry_spec, P(), P(), jax.tree.map(lambda _: P(), consts_tree)),
            out_specs=(carry_spec, out_stats_spec),
            check_vma=False,
        )

    def _scan(self, num_chunks: int, num_syms: int):
        lifted = self._shard_lifted(num_syms)
        if lifted is not None:
            fn, consts, spec, local, probe = lifted
            allconsts = consts if probe is None else (consts, probe[1])
            jkey = ("sscan", spec, self.mesh, num_chunks, self.stream_mode)
            j = _SHARED_SHARD_JIT.get(jkey)
            if j is None:
                sm = self._build_shard_pallas_scan(fn, allconsts, num_chunks, probe=probe)
                j = _SHARED_SHARD_JIT.setdefault(jkey, jax.jit(sm))
            return lambda key, carry0, snr, sp: j(key, carry0, snr, sp, allconsts)
        key_ = ("sscan", num_chunks, num_syms)
        if key_ not in self._jitted:
            fn, _ = self._shard_chunk(num_syms, False)

            def f(key, carry0, snr_db, sqrt_power):
                def body(cs, i):
                    carry, acc = cs
                    stats, carry = fn(
                        jax.random.fold_in(key, i), carry, snr_db, sqrt_power
                    )
                    return (carry, _acc_add(acc, stats)), None

                (carry, acc), _ = jax.lax.scan(
                    body, (carry0, _acc_init()), jnp.arange(num_chunks)
                )
                return carry, acc

            self._jitted[key_] = jax.jit(f)
        return self._jitted[key_]

    def _init_carry(self):
        return self._init_carry_sharded()

    def _grid_scan(self, num_points: int, num_chunks: int, num_syms: int):
        """Sharded whole-grid executable: SNR points x chunks inside shard_map.

        One dispatch for the entire sweep; collectives fire once per run
        (stacked (num_points, num_chunks) counters psum at the end).  Stream
        layout per shard is ``fold_in(fold_in(fold_in(key, point_id), chunk),
        shard)`` — bit-identical to a host loop of sharded runs with
        ``point_key = fold_in(key, point_id)``.  Returns None off the lifted
        fused-kernel path (run_grid then falls back to looped run()).
        """
        lifted = self._shard_lifted(num_syms)
        if lifted is None:
            return None
        fn, consts, spec, local, probe = lifted
        allconsts = consts if probe is None else (consts, probe[1])
        pfn = None if probe is None else probe[0]
        jkey = ("sgrid", spec, self.mesh, num_points, num_chunks, self.stream_mode)
        j = _SHARED_SHARD_JIT.get(jkey)
        if j is None:

            def f(key, carry0, point_ids, snrs, sqrt_powers, consts_):
                idx = jax.lax.axis_index(MC_AXIS)
                if pfn is not None:
                    consts_, pconsts = consts_

                def pbody(_, xs):
                    p, snr, sp = xs
                    pkey = jax.random.fold_in(key, p)

                    def cbody(cs, i):
                        c, acc_ = cs
                        k = jax.random.fold_in(jax.random.fold_in(pkey, i), idx)
                        if pfn is not None:
                            stats, c2 = self._halo_kernel_step(
                                fn, pfn, k, c, snr, sp, consts_, pconsts
                            )
                        else:
                            stats, c2 = fn(k, c, snr, sp, consts_)
                        return (c2, _acc_add(acc_, stats)), None

                    (c_end, acc_), _ = jax.lax.scan(
                        cbody, (carry0[0], _acc_init()), jnp.arange(num_chunks)
                    )
                    return None, (acc_, c_end)

                _, (acc, c_end) = jax.lax.scan(
                    pbody, None, (point_ids, snrs, sqrt_powers)
                )
                acc["be_lo"] = jax.lax.psum(acc["be_lo"], MC_AXIS)
                acc["be_hi"] = jax.lax.psum(acc["be_hi"], MC_AXIS)
                acc["se_lo"] = jax.lax.psum(acc["se_lo"], MC_AXIS)
                acc["se_hi"] = jax.lax.psum(acc["se_hi"], MC_AXIS)
                acc["papr_peak"] = jax.lax.pmax(acc["papr_peak"], MC_AXIS)
                acc["papr_sum"] = jax.lax.psum(acc["papr_sum"], MC_AXIS)
                acc["papr_sum_c"] = jax.lax.psum(acc["papr_sum_c"], MC_AXIS)
                acc["papr_count"] = jax.lax.psum(acc["papr_count"], MC_AXIS)
                acc["papr_count_c"] = jax.lax.psum(acc["papr_count_c"], MC_AXIS)
                # Per-point per-shard carries, shard axis restored at axis 1:
                # global (num_points, n_dev, ...) so run_grid's carries[p] is
                # exactly a sharded carry for the remainder step.
                return acc, jax.tree.map(lambda a: a[:, None], c_end)

            carry_spec = jax.tree.map(
                lambda _: P(MC_AXIS), self._init_carry_sharded()
            )
            out_carry_spec = jax.tree.map(
                lambda _: P(None, MC_AXIS), self._init_carry_sharded()
            )
            out_stats_spec: Dict[str, Any] = {
                k: P() for k in (
                    "be_lo", "be_hi", "se_lo", "se_hi", "papr_peak",
                    "papr_sum", "papr_sum_c", "papr_count", "papr_count_c",
                )
            }
            sm = shard_map(
                f,
                mesh=self.mesh,
                in_specs=(
                    P(),
                    carry_spec,
                    P(),
                    P(),
                    P(),
                    jax.tree.map(lambda _: P(), allconsts),
                ),
                out_specs=(out_stats_spec, out_carry_spec),
                check_vma=False,
            )
            j = _SHARED_SHARD_JIT.setdefault(jkey, jax.jit(sm))
        return lambda key, carry0, pids, snrs, sps: j(
            key, carry0, pids, snrs, sps, allconsts
        )

    def _grid_multi_lift(self, chunk: int):
        # Halo mode (round 5): the per-runner probe consts (adaptive order
        # rows + TX matrices) ride the stacked-consts tree as a
        # (consts, probe_consts) pair, so adaptive halo sweeps stay on the
        # one-dispatch fused grid too.
        lifted = self._shard_lifted(chunk)
        if lifted is None:
            return None
        fn, consts, spec, _local, probe = lifted
        return fn, (consts if probe is None else (consts, probe[1])), spec

    def _grid_scan_multi(self, num_points: int, num_chunks: int, spec, fn, consts0):
        """Sharded multi-consts grid (adaptive sweeps): consts scan as xs
        inside shard_map, replicated across shards; same stream layout and
        collective placement as `_grid_scan`.  In halo mode each point's
        consts leaf is a (consts, probe_consts) pair and every chunk runs
        probe -> ppermute -> kernel (`_halo_kernel_step`)."""
        pfn = None
        if self.stream_mode == "halo" and spec.conv != "diag":
            from ofdm_tpu.ops import pallas_link

            pfn = pallas_link._probe_fn_for_spec(spec)
        jkey = ("sagrid", spec, self.mesh, num_points, num_chunks, self.stream_mode)
        j = _SHARED_SHARD_JIT.get(jkey)
        if j is None:

            def f(key, carry0, point_ids, snrs, sqrt_powers, consts_stacked):
                idx = jax.lax.axis_index(MC_AXIS)

                def pbody(_, xs):
                    p, snr, sp, consts_ = xs
                    if pfn is not None:
                        consts_, pconsts = consts_
                    pkey = jax.random.fold_in(key, p)

                    def cbody(cs, i):
                        c, acc_ = cs
                        k = jax.random.fold_in(jax.random.fold_in(pkey, i), idx)
                        if pfn is not None:
                            stats, c2 = self._halo_kernel_step(
                                fn, pfn, k, c, snr, sp, consts_, pconsts
                            )
                        else:
                            stats, c2 = fn(k, c, snr, sp, consts_)
                        return (c2, _acc_add(acc_, stats)), None

                    (c_end, acc_), _ = jax.lax.scan(
                        cbody, (carry0[0], _acc_init()), jnp.arange(num_chunks)
                    )
                    return None, (acc_, c_end)

                _, (acc, c_end) = jax.lax.scan(
                    pbody, None, (point_ids, snrs, sqrt_powers, consts_stacked)
                )
                acc["be_lo"] = jax.lax.psum(acc["be_lo"], MC_AXIS)
                acc["be_hi"] = jax.lax.psum(acc["be_hi"], MC_AXIS)
                acc["se_lo"] = jax.lax.psum(acc["se_lo"], MC_AXIS)
                acc["se_hi"] = jax.lax.psum(acc["se_hi"], MC_AXIS)
                acc["papr_peak"] = jax.lax.pmax(acc["papr_peak"], MC_AXIS)
                acc["papr_sum"] = jax.lax.psum(acc["papr_sum"], MC_AXIS)
                acc["papr_sum_c"] = jax.lax.psum(acc["papr_sum_c"], MC_AXIS)
                acc["papr_count"] = jax.lax.psum(acc["papr_count"], MC_AXIS)
                acc["papr_count_c"] = jax.lax.psum(acc["papr_count_c"], MC_AXIS)
                return acc, jax.tree.map(lambda a: a[:, None], c_end)

            carry_spec = jax.tree.map(
                lambda _: P(MC_AXIS), self._init_carry_sharded()
            )
            out_carry_spec = jax.tree.map(
                lambda _: P(None, MC_AXIS), self._init_carry_sharded()
            )
            out_stats_spec: Dict[str, Any] = {
                k: P() for k in (
                    "be_lo", "be_hi", "se_lo", "se_hi", "papr_peak",
                    "papr_sum", "papr_sum_c", "papr_count", "papr_count_c",
                )
            }
            sm = shard_map(
                f,
                mesh=self.mesh,
                in_specs=(
                    P(),
                    carry_spec,
                    P(),
                    P(),
                    P(),
                    jax.tree.map(lambda _: P(), consts0),
                ),
                out_specs=(out_stats_spec, out_carry_spec),
                check_vma=False,
            )
            j = _SHARED_SHARD_JIT.setdefault(jkey, jax.jit(sm))
        return j

    def _dump_step(self, num_syms_global: int):
        """Sharded chunk-0 capture: every shard runs the dump-variant
        kernel on its local slice (same fold_in'd key + carry wiring as the
        counting run, including the halo probe->ppermute exchange) and the
        tile-0 planes gather along the shard axis — so `run(collect_symbols
        =...)` renders BITWISE counted symbols on sharded runs too
        (closing the single-device/sharded capture asymmetry)."""
        key_ = ("sdump", num_syms_global, self.stream_mode)
        if key_ in self._jitted:
            return self._jitted[key_]
        from ofdm_tpu.ops import pallas_link

        jd = None
        if num_syms_global % self.n_dev == 0:
            local = num_syms_global // self.n_dev
            lifted = pallas_link.make_pallas_dump_lifted(
                self, local, interpret=self._interpret
            )
            probe = None
            if lifted is not None and self.stream_mode == "halo":
                _, _, dspec = lifted
                if dspec.conv != "diag":
                    probe = pallas_link.make_carry_probe(
                        self, local, interpret=self._interpret
                    )
                    if probe is None:
                        lifted = None
            if lifted is not None:
                fn, consts, _spec = lifted
                pfn = None if probe is None else probe[0]
                allconsts = consts if probe is None else (consts, probe[1])

                def f(key, carry, snr_db, sqrt_power, consts_):
                    idx = jax.lax.axis_index(MC_AXIS)
                    k = jax.random.fold_in(key, idx)
                    if pfn is not None:
                        consts__, pconsts = consts_
                        stats, _ = self._halo_kernel_step(
                            fn, pfn, k, carry[0], snr_db, sqrt_power,
                            consts__, pconsts,
                        )
                    else:
                        stats, _ = fn(k, carry[0], snr_db, sqrt_power, consts_)
                    return stats["received_symbols"]

                carry_spec = jax.tree.map(
                    lambda _: P(MC_AXIS), self._init_carry_sharded()
                )
                sm = shard_map(
                    f,
                    mesh=self.mesh,
                    in_specs=(
                        P(), carry_spec, P(), P(),
                        jax.tree.map(lambda _: P(), allconsts),
                    ),
                    out_specs=cplx.CArray(P(MC_AXIS), P(MC_AXIS)),
                    check_vma=False,
                )
                jj = jax.jit(sm)

                def jd(key, carry, snr_db, sqrt_power, _jj=jj, _ac=allconsts):
                    sym = _jj(key, carry, snr_db, sqrt_power, _ac)
                    return {"received_symbols": sym}, None

        self._jitted[key_] = jd
        return jd

    def _pallas_chunk_multiple(self) -> int:
        from ofdm_tpu.ops import pallas_link

        return self.n_dev * pallas_link.chunk_multiple(self)


# ---------------------------------------------------------------------------
# Grid sweep driver (SNR x channel), with resumable results
# ---------------------------------------------------------------------------


def run_sweep(
    base_cfg: SimulationConfig,
    snrs: Optional[Sequence[float]] = None,
    channels: Optional[Sequence[str]] = None,
    key: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    sharded: bool = True,
    stream_mode: str = "independent",
    collect_symbols: int = 0,
    results_manager=None,
    grid: bool = True,
) -> List[Dict[str, Any]]:
    """Run an SNR x channel grid; returns one results dict per point.

    Mirrors `SimulationRunner.run_all` (main.py:217-249) with TPU semantics:
    fixed-mode points share one compiled executable per channel; adaptive
    points compile per SNR (orders are SNR-dependent).  If a
    ``results_manager`` (ofdm_tpu.utils.report.ResultsManager) is supplied,
    each point is upserted into the BER CSV as soon as it completes, so an
    interrupted sweep resumes at the grid level like the reference's CSV
    upsert (main.py:69-101).

    ``grid=True`` (default) runs each channel's whole fixed-mode SNR sweep in
    ONE device dispatch via ``LinkRunner.run_grid`` (the SNR axis scans
    inside the executable; per-dispatch latency on remote-relay backends is
    ~140 ms, which otherwise dominates moderate sweeps).  Results are
    bit-identical to the looped form — the grid uses the same
    ``fold_in(key, point_index)`` per-point streams.  Adaptive sweeps run
    through ``run_grid_multi`` (per-point consts as stacked scan inputs,
    partitioned by kernel spec — a few dispatches instead of one per
    point); configs off the grid-capable paths fall back to the loop.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    snrs = list(snrs) if snrs is not None else [base_cfg.snr_db]
    channels = list(channels) if channels is not None else [base_cfg.channel_model]

    results: List[Dict[str, Any]] = []
    for channel in channels:
        cfg = base_cfg.replace(channel_model=channel)
        runner_cls = ShardedLinkRunner if sharded else LinkRunner
        adaptive = cfg.adaptive_modulation_mode.name == "CAPACITY_BASED"
        runner = None
        if grid and adaptive and len(snrs) > 1:
            # Adaptive points need per-point consts (SNR-dependent bit
            # loading) but usually share one kernel spec — run the whole
            # sweep in one dispatch with the consts stacked as scan inputs.
            point_runners = []
            for snr in snrs:
                setup = prepare(cfg.replace(snr_db=float(snr)))
                point_runners.append(
                    runner_cls(setup, mesh=mesh, stream_mode=stream_mode)
                    if runner_cls is ShardedLinkRunner
                    else runner_cls(setup)
                )
            t0 = time.perf_counter()
            rs = run_grid_multi(
                point_runners,
                key,
                snrs,
                collect_symbols=collect_symbols,
                key_offset=len(results),
            )
            wall = (time.perf_counter() - t0) / max(len(rs), 1)
            for r in rs:
                r["channel_model"] = channel
                r["wall_time_s"] = wall
                results.append(r)
                if results_manager is not None:
                    results_manager.record(r)
            continue
        if grid and not adaptive and len(snrs) > 1:
            setup = prepare(cfg.replace(snr_db=float(snrs[0])))
            runner = (
                runner_cls(setup, mesh=mesh, stream_mode=stream_mode)
                if runner_cls is ShardedLinkRunner
                else runner_cls(setup)
            )
            t0 = time.perf_counter()
            rs = runner.run_grid(
                key,
                snrs,
                collect_symbols=collect_symbols,
                key_offset=len(results),
            )
            wall = (time.perf_counter() - t0) / max(len(rs), 1)
            for r in rs:
                r["channel_model"] = channel
                r["wall_time_s"] = wall
                results.append(r)
                if results_manager is not None:
                    results_manager.record(r)
            continue
        for snr in snrs:
            t0 = time.perf_counter()
            if adaptive or runner is None:
                setup = prepare(cfg.replace(snr_db=float(snr)))
                runner = (
                    runner_cls(setup, mesh=mesh, stream_mode=stream_mode)
                    if runner_cls is ShardedLinkRunner
                    else runner_cls(setup)
                )
            point_key = jax.random.fold_in(key, len(results))  # deterministic per point
            r = runner.run(point_key, collect_symbols=collect_symbols, snr_db=float(snr))
            r["channel_model"] = channel
            r["wall_time_s"] = time.perf_counter() - t0
            results.append(r)
            if results_manager is not None:
                results_manager.record(r)
    return results
