"""Three carts on a line with inelastic collisions (non-smooth contact toy).

Capability parity with
``/root/reference/examples/three_cart/three_cart_dynamics.py:26-194``:
state = [q1, q2, q3, v1, v2, v3], input = [u1, u3] (forces on outer carts),
cart width ``d``.  Semi-implicit Euler then four-case collision resolution
(all-three / 1-2 / 2-3 / none), implemented with ``jnp.where`` masks instead
of python branches so a single trace covers every case and the function is
vmap/jit-safe on TPU.

Also provides the sample-projection operator onto the non-penetration set
(reference ``:196-264``).  NOTE the reference applies full ``penetration_depth``
shifts in ``dynamics_batch`` (``:168-169``) but half shifts in ``dynamics``
(``:69-71``) — a quirk; we use the symmetric half-shift (the single-sample
semantics) everywhere, which keeps batch == unbatched (tested).
"""
import jax.numpy as jnp

from .base import System


def make_three_cart(h: float = 0.1, d: float = 0.2) -> System:
    def step(x, u):
        q1, q2, q3, v1, v2, v3 = x
        u1, u3 = u[0], u[1]

        v1s = v1 + h * u1
        v2s = v2
        v3s = v3 + h * u3
        q1s = q1 + h * v1s
        q2s = q2 + h * v2s
        q3s = q3 + h * v3s

        pen12 = (q2s - q1s) < d
        pen23 = (q3s - q2s) < d

        # Case 1: all three in collision — cluster at the mean position
        # (Gauss's principle) and average velocities (inelastic impact).
        q2_c1 = (q1s + q2s + q3s) / 3.0
        q1_c1 = q2_c1 - d
        q3_c1 = q2_c1 + d
        v_c1 = (v1s + v2s + v3s) / 3.0

        # Case 2: only carts 1-2 in collision.
        depth12 = d - (q2s - q1s)
        q2_c2 = q2s + 0.5 * depth12
        q1_c2 = q1s - 0.5 * depth12
        v12 = 0.5 * (v1s + v2s)

        # Case 3: only carts 2-3 in collision.
        depth23 = d - (q3s - q2s)
        q3_c3 = q3s + 0.5 * depth23
        q2_c3 = q2s - 0.5 * depth23
        v23 = 0.5 * (v2s + v3s)

        both = pen12 & pen23
        only12 = pen12 & ~pen23
        only23 = ~pen12 & pen23

        q1n = jnp.where(both, q1_c1, jnp.where(only12, q1_c2, q1s))
        q2n = jnp.where(both, q2_c1,
                        jnp.where(only12, q2_c2,
                                  jnp.where(only23, q2_c3, q2s)))
        q3n = jnp.where(both, q3_c1, jnp.where(only23, q3_c3, q3s))
        v1n = jnp.where(both, v_c1, jnp.where(only12, v12, v1s))
        v2n = jnp.where(both, v_c1,
                        jnp.where(only12, v12,
                                  jnp.where(only23, v23, v2s)))
        v3n = jnp.where(both, v_c1, jnp.where(only23, v23, v3s))

        return jnp.stack([q1n, q2n, q3n, v1n, v2n, v3n])

    def projection(x, dx, u, du):
        """Project sampled states onto the non-penetration set q2-q1 >= d,
        q3-q2 >= d.  Returns (x_proj, u_proj) as *absolute* samples.

        The reference quirk of feeding absolute projected samples into a
        delta-expecting estimator (``three_cart_zero_order.py:38-43``) is NOT
        replicated; callers receive absolute samples and the estimator API
        takes deltas explicitly (see ops/estimators.py).
        """
        xp = x[None, :] + dx
        up = u[None, :] + du
        q1, q2, q3 = xp[:, 0], xp[:, 1], xp[:, 2]

        pen12 = (q2 - q1) < d
        pen23 = (q3 - q2) < d
        both = pen12 & pen23
        only12 = pen12 & ~pen23
        only23 = ~pen12 & pen23

        q2_c1 = (q1 + q2 + q3) / 3.0
        depth12 = d - (q2 - q1)
        depth23 = d - (q3 - q2)

        q1n = jnp.where(both, q2_c1 - d, jnp.where(only12, q1 - 0.5 * depth12, q1))
        q2n = jnp.where(both, q2_c1,
                        jnp.where(only12, q2 + 0.5 * depth12,
                                  jnp.where(only23, q2 - 0.5 * depth23, q2)))
        q3n = jnp.where(both, q2_c1 + d, jnp.where(only23, q3 + 0.5 * depth23, q3))

        xp = xp.at[:, 0].set(q1n).at[:, 1].set(q2n).at[:, 2].set(q3n)
        return xp, up

    return System(name="three_cart", dim_x=6, dim_u=2, h=h, step=step,
                  projection=projection)
