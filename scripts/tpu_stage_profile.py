"""Stage-level decomposition of the slow-quartile TPU steps.

Times each stage of the IPSDTA and dense-MNMF iterations as its own
chained-scan program on the current backend (methodology of
scripts/tpu_roofline.py: chained data-dependent executions + host
readback barrier). Usage:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_stage_profile.py ipsdta mnmf
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def chain(step, carry, read_leaf, n=30, reps=3):
    import jax
    from jax import lax

    @functools.partial(jax.jit, static_argnums=1)
    def runner(c, k):
        return lax.scan(lambda c, _: (step(c), None), c, None, length=k)[0]

    np.asarray(read_leaf(runner(carry, n)))
    c = carry
    t0 = time.perf_counter()
    for _ in range(reps):
        c = runner(c, n)
    np.asarray(read_leaf(c))
    return (time.perf_counter() - t0) / reps / n * 1e3  # ms/iter


def profile_ipsdta():
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.ops import splitc as sc

    rng = np.random.default_rng(0)
    M, I, T, K, n_blocks = 8, 256, 627, 4, 64
    J = I // n_blocks
    Xs = jax.device_put(rng.standard_normal((2, M, I, T)).astype(np.float32))
    W0 = np.zeros((2, I, M, M), dtype=np.float32)
    W0[0] = np.eye(M)
    Tb = np.tile(np.eye(J, dtype=np.float32), (M, K, n_blocks, 1, 1)) * 0.5 + 0.1
    T_parts = (jnp.asarray(np.stack([Tb, np.zeros_like(Tb)])),)
    V0 = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    W = jax.device_put(W0)

    def _step(c):
        Wn, Tn, Vn = sc.ipsdta_vcd_step_sc(Xs, c[0], (c[1],), c[2])
        return (Wn, Tn[0], Vn)

    full = chain(_step, (W, T_parts[0], V0), lambda c: c[0])
    print(f"ipsdta full step: {full:.2f} ms/iter ({1e3/full:.1f} it/s)")

    # time the step with a 1-basis model to split off basis-update cost
    Tb1 = T_parts[0][:, :, :1]
    V1 = V0[:, :1]

    def _step1(c):
        Wn, Tn, Vn = sc.ipsdta_vcd_step_sc(Xs, c[0], (c[1],), c[2])
        return (Wn, Tn[0], Vn)

    k1 = chain(_step1, (W, Tb1, V1), lambda c: c[0])
    print(f"ipsdta K=1 step: {k1:.2f} ms/iter (basis/activation share ~= {full-k1:.2f} ms)")


def profile_mnmf():
    import jax
    import jax.numpy as jnp

    from ssspy_tpu.ops import splitc as sc

    rng = np.random.default_rng(0)
    M, I, T, K = 8, 257, 627, 8
    Xc = rng.standard_normal((M, I, T)) + 1j * rng.standard_normal((M, I, T))
    Xs = jnp.asarray(np.stack([Xc.real, Xc.imag]).astype(np.float32))
    XXs = jax.device_put(np.asarray(sc.instant_covariance_sc(Xs)))
    Tm = jax.device_put((rng.random((M, I, K)) + 0.1).astype(np.float32))
    Vm = jax.device_put((rng.random((M, K, T)) + 0.1).astype(np.float32))
    Hm = np.tile(np.eye(M, dtype=np.float32), (M, I, 1, 1)) + np.float32(0.1)
    Hs = jax.device_put(np.stack([Hm, np.zeros_like(Hm)]))

    full = chain(
        lambda c: sc.gauss_mnmf_step_sc(XXs, *c),
        (Tm, Vm, Hs),
        lambda c: c[0],
    )
    print(f"mnmf full step: {full:.2f} ms/iter ({1e3/full:.1f} it/s)")

    # stage: one traces() pass == model + inv_sandwich + 2 trace einsums.
    # Approximate by timing the step with normalization off vs on, and
    # the sandwich kernel standalone:
    from ssspy_tpu.ops.pallas_kernels import planar_inv_sandwich_sc

    Rr = jnp.asarray(XXs[0] + 1e-2 * np.eye(M, dtype=np.float32))
    Ri = jnp.asarray(XXs[1])

    def sandwich_step(c):
        o = planar_inv_sandwich_sc(c[0], c[1], XXs[0], XXs[1])
        # data-dependent chaining: feed a scaled output back
        return (c[0] + 0.0 * o[0], c[1])

    sw = chain(sandwich_step, (Rr, Ri), lambda c: c[0], n=10)
    print(f"inv_sandwich standalone: {sw:.2f} ms/call (x3 per iter = {3*sw:.2f} ms)")

    # model reconstruction einsum standalone
    def model_step(c):
        T_, = c
        Lamb = T_ @ Vm
        Rr = jnp.einsum("nit,nipq->itpq", Lamb, Hs[0])
        Ri = jnp.einsum("nit,nipq->itpq", Lamb, Hs[1])
        return (T_ + 0.0 * jnp.einsum("itpq->i", Rr)[:, None] + 0.0 * Ri.sum(),)

    md = chain(model_step, (Tm,), lambda c: c[0], n=10)
    print(f"model einsum standalone: {md:.2f} ms/call (x3 per iter = {3*md:.2f} ms)")


if __name__ == "__main__":
    targets = sys.argv[1:] or ["ipsdta", "mnmf"]
    if "ipsdta" in targets:
        profile_ipsdta()
    if "mnmf" in targets:
        profile_mnmf()
