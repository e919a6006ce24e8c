"""Multi-chip path-sharded pricing over a TPU mesh.

The reference is single-GPU: its only "cross-worker" communication is
intra-device (shared-memory reductions + atomicAdd, SURVEY.md §2).
This module is the TPU-native scale-out the reference lacks: Monte
Carlo paths are data-parallel, so we shard the path axis over a 1-D
``jax.sharding.Mesh`` with ``shard_map``; each chip runs the fused
kernel (or golden engine) on its shard with a *disjoint stream range*
(base_path offset = chip_index * paths_per_chip, so the sharded run
draws exactly the same per-path randomness as a single-chip run), and
two scalars (sum payoff, sum payoff^2) are combined with
``jax.lax.psum`` over ICI — the deterministic analogue of the
reference's float atomicAdd (``NMCH_FE.cu:74-78``), cf. SURVEY.md §5.

Scaling model (design property, NOT a multi-chip measurement — this
environment has one chip; correctness is validated on virtual-device
meshes and a 2-process gloo run, tests/test_parallel.py +
test_multihost.py): zero cross-chip traffic during simulation and one
2-float psum at the end make throughput linear in chips by
construction, so the 2^26-path BASELINE.json config is paths_per_chip
= 2^26/n_chips with identical statistics to the single-chip run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fe import fe_moments_scan, path_index_grid
from ..ops.fe_pallas import fe_moments_pallas
from ..ops.em import em_moments_scan
from ..ops.em_pallas import em_moments_pallas

PATH_AXIS = "paths"


def make_mesh(devices=None, axis_name: str = PATH_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    import numpy as np
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_moments(mesh: Mesh, params_vec, seed: int, epoch, *,
                    N: int, n_paths: int, method: str = "fe",
                    engine: str = "pallas", interpret: bool = False,
                    rng: str = "philox", rot: int = 1,
                    conditional: bool = False,
                    scramble: str = "auto",
                    poisson_cut: float | None = None):
    """(E[X], E[X^2]) over n_paths sharded across the mesh's path axis.

    Every chip simulates n_paths/n_chips paths whose stream indices are
    offset by its mesh position, then the two partial sums ride one
    psum over ICI.  Identical results to a single-chip run with the
    same (seed, epoch) — sharding changes the schedule, not the math.

    poisson_cut (EM only): None resolves to NMCH_EM's default (the
    measured fast cut, methods/em.py) so a default sharded EM run
    draws the SAME randomness as a default single-chip NMCH_EM run —
    the ops layer's own None would mean the strict curand cut 4000
    and silently break that parity (round-5 review); pass 4000.0
    explicitly for curand-parity switching.
    """
    n_dev = mesh.devices.size
    if n_paths % (n_dev * 128):
        raise ValueError(
            f"n_paths={n_paths} must be a multiple of 128*n_devices"
            f"={128 * n_dev}")
    if method == "em" and rng not in ("philox", "threefry4",
                                      "mrg32k3a", "xorwow"):
        raise ValueError("method='em' supports rng='philox'/'threefry4'/"
                         "'mrg32k3a'/'xorwow'")
    if method == "fe" and engine == "scan" and rng == "tpu":
        raise ValueError("rng='tpu' requires engine='pallas'")
    if rng in ("mrg32k3a", "xorwow"):
        # the stateful parity families shard exactly like the counter
        # rngs: their matrix skip-ahead gives random access to any
        # (path, epoch), so disjoint per-chip base-path ranges draw the
        # same per-path streams as a single-chip run (round-3 VERDICT
        # next-step #5); round 5 extended them to EM (the samplers
        # advance the carried state lane-locally, ops/sampling.py)
        if engine != "scan":
            raise ValueError(f"rng={rng!r} shards with engine='scan' "
                             f"only (the stateful recurrences live in "
                             f"the scan carry)")
        if rot != 1:
            raise ValueError(f"rng={rng!r} has no rot variants")
        if n_paths >= (1 << 31):
            raise ValueError(f"rng={rng!r} supports n_paths < 2^31 "
                             f"(path-jump bit range)")
        from ..rng.streams import stateful_max_epoch
        bound = stateful_max_epoch(rng)
        if int(epoch) >= bound:
            raise ValueError(f"epoch={int(epoch)} exceeds the {rng} "
                             f"stream layout's {bound} epochs per "
                             f"path block")
    if scramble not in ("auto", "lms-shift") and engine != "qmc":
        raise ValueError("scramble= applies to engine='qmc' only")
    if scramble == "auto":
        # measured crossover (RESULTS.md round-4 attribution): shared
        # LMS below ~2^21 points, independent Owen scrambles above
        scramble = ("owen" if n_paths >= (1 << 21) else "lms-shift")
    if engine not in ("pallas", "scan", "qmc"):
        raise ValueError(
            f"unknown engine {engine!r} for sharded_moments (expected "
            "'pallas', 'scan' or 'qmc')")
    if engine == "qmc" and method != "fe":
        raise ValueError("engine='qmc' is FE-only")
    if engine == "qmc" and rot != 1:
        raise ValueError("engine='qmc' has no rot variants")
    if method == "em" and rot != 1:
        raise ValueError("rot is FE-only")
    if method == "fe" and conditional:
        raise ValueError("conditional is EM-only")
    if poisson_cut is not None and method != "em":
        raise ValueError("poisson_cut is EM-only")
    if method == "em" and poisson_cut is None:
        from ..ops.em import FAST_POISSON_CUT
        poisson_cut = FAST_POISSON_CUT   # NMCH_EM's default (docstring)
    per_chip = n_paths // n_dev
    from ..rng.philox import split_seed
    k0, k1 = split_seed(seed)
    seed_words = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])

    if engine == "qmc":
        # Sobol' POINT-INDEX ranges are sharded: chip c simulates
        # points [c*count, (c+1)*count) of every shift replicate —
        # bit-identical slices of the single-device point set
        # (rng/sobol.py hilo base offset) — and the (n_shifts,)
        # per-replicate payoff sums ride one psum.  Requires
        # n_paths/n_shifts divisible by n_dev (and the hilo block).
        from ..ops.fe_qmc import (
            qmc_replicate_payoff_sums, rqmc_moments_from_means,
            DEFAULT_N_SHIFTS,
        )
        n_shifts = DEFAULT_N_SHIFTS
        n = n_paths // n_shifts
        if n % n_dev:
            raise ValueError(f"n_paths/n_shifts={n} must be divisible "
                             f"by n_devices={n_dev}")
        count = n // n_dev
        sim = "scan" if interpret or count % 1024 else "pallas"

        def qmc_shard_fn(pv, ep):
            idx = jax.lax.axis_index(PATH_AXIS)
            base = idx.astype(jnp.uint32) * jnp.uint32(count)
            sums = qmc_replicate_payoff_sums(
                pv, ep, k0, k1, N=N, count=count, n_shifts=n_shifts,
                sim=sim, interpret=interpret, scramble=scramble,
                base=base)
            means = jax.lax.psum(sums, PATH_AXIS) / jnp.float32(n)
            return rqmc_moments_from_means(means, n_paths, n_shifts)

        fn = jax.jit(jax.shard_map(
            qmc_shard_fn, mesh=mesh, in_specs=(P(), P()),
            out_specs=(P(), P()), check_vma=False,
        ), static_argnums=())
        return fn(params_vec, jnp.uint32(epoch))

    def shard_fn(pv, sw, ep):
        idx = jax.lax.axis_index(PATH_AXIS)
        base = (idx.astype(jnp.uint32) * jnp.uint32(per_chip))
        if engine == "pallas":
            if method == "fe":
                m, m2 = fe_moments_pallas(pv, sw, ep, base, N=N,
                                          n_paths=per_chip, rng=rng,
                                          rot=rot, interpret=interpret)
            else:
                m, m2 = em_moments_pallas(pv, sw, ep, base, N=N,
                                          n_paths=per_chip, rng=rng,
                                          conditional=conditional,
                                          poisson_cut=poisson_cut,
                                          interpret=interpret)
        else:
            pidx = path_index_grid(per_chip) + base
            if method == "fe" and rng in ("mrg32k3a", "xorwow"):
                if rng == "mrg32k3a":
                    from ..ops.fe_mrg import fe_moments_mrg as stateful
                else:
                    from ..ops.fe_xorwow import fe_moments_xorwow \
                        as stateful
                m, m2 = stateful(pv, N, pidx, ep, seed)
            elif method == "fe" and rot > 1:
                from ..ops.fe import fe_moments_rot_scan
                m, m2 = fe_moments_rot_scan(pv, N, pidx, ep, sw[0], sw[1],
                                            rng=rng, rot=rot)
            elif method == "fe":
                m, m2 = fe_moments_scan(pv, N, pidx, ep, sw[0], sw[1],
                                        rng=rng)
            else:
                m, m2 = em_moments_scan(
                    pv, N, pidx, ep, sw[0], sw[1], rng=rng,
                    conditional=conditional, poisson_cut=poisson_cut,
                    seed=seed if rng in ("mrg32k3a", "xorwow") else None)
        # per-chip means -> global means (equal shard sizes)
        nd = jnp.float32(n_dev)
        return (jax.lax.psum(m, PATH_AXIS) / nd,
                jax.lax.psum(m2, PATH_AXIS) / nd)

    # check_vma=False: pallas_call outputs carry no varying-manual-axes
    # metadata (jax 0.9), so the vma type-checker cannot see through the
    # kernels; correctness is covered by the sharded-vs-single tests.
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return fn(params_vec, seed_words, jnp.uint32(epoch))
