"""Utility subsystem tests: checkpoint/resume, config, timers, viz."""
import numpy as np
import pytest

from irs_mpc_tpu import IrsMpc, IrsMpcParams, SmoothingConfig, make_pendulum
from irs_mpc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from irs_mpc_tpu.utils.config import ExperimentConfig, make_system
from irs_mpc_tpu.utils.timing import PhaseTimer


def _solver(T=50):
    return IrsMpc(make_pendulum(0.05), IrsMpcParams(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)),
        gradient_mode="zero_order",
        smoothing=SmoothingConfig(num_samples=200, std_x=1.0, std_u=1.0)))


def test_checkpoint_resume_bitwise(tmp_path):
    """Resuming from a checkpoint must reproduce the uninterrupted run
    exactly (key + iteration are part of the state)."""
    a = _solver()
    a.iterate(5, verbose=False)

    b = _solver()
    b.iterate(2, verbose=False)
    ckpt = save_checkpoint(tmp_path / "ck.npz", b)
    c = _solver()
    load_checkpoint(ckpt, c)
    assert c.iter == b.iter
    c.iterate(3, verbose=False)
    np.testing.assert_array_equal(np.asarray(c.u_trj), np.asarray(a.u_trj))
    assert abs(c.cost - a.cost) < 1e-6


def test_experiment_config_roundtrip(tmp_path):
    cfg = ExperimentConfig(system="bicycle", T=42, gradient_mode="exact")
    p = cfg.to_json(tmp_path / "cfg.json")
    cfg2 = ExperimentConfig.from_json(p)
    assert cfg2 == cfg


def test_system_registry():
    sys = make_system("pendulum", 0.05)
    assert sys.dim_x == 2
    sys = make_system("box_pushing", 0.1)
    assert sys.dim_x == 5
    with pytest.raises(KeyError):
        make_system("nope", 0.1)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_viz_smoke(tmp_path):
    from irs_mpc_tpu.utils.viz import plot_cost_curves, plot_phase_trajectories
    p = plot_cost_curves({"all": [3, 2, 1]}, tmp_path / "c.png")
    assert p.exists()
    p2 = plot_phase_trajectories([np.random.randn(10, 2) for _ in range(3)],
                                 tmp_path / "ph.png")
    assert p2.exists()


def test_analytic_animation_smoke(tmp_path):
    from irs_mpc_tpu.utils.viz import animate_analytic_trajectory
    for name, dim in [("pendulum", 2), ("three_cart", 6),
                      ("bicycle", 5), ("quadrotor", 12)]:
        x = np.cumsum(np.ones((5, dim)) * 0.1, axis=0)
        p = animate_analytic_trajectory(name, x, tmp_path / f"{name}.gif",
                                        fps=2)
        assert p.exists() and p.stat().st_size > 0


def test_contact_animation_smoke(tmp_path):
    from irs_mpc_tpu.models.contact.systems import make_box_pushing
    from irs_mpc_tpu.utils.viz import animate_contact_trajectory
    m = make_box_pushing()
    x_trj = np.tile(np.array([0., 0.5, 0., 0., -0.2]), (3, 1))
    p = animate_contact_trajectory(m, x_trj, tmp_path / "a.gif", fps=2)
    assert p.exists()


def test_solver_registry_aliases():
    from irs_mpc_tpu import get_solver
    assert get_solver("osqp").kind == "admm"      # reference alias
    assert get_solver("gurobi").kind == "admm"
    assert get_solver("riccati").kind == "riccati"
    with pytest.raises(ValueError):
        get_solver("mystery")


def test_make_system_contact_model_override():
    """make_system("X", h, contact_model="lcp") builds the LCP-mode
    quasistatic step; requesting a contact scheme for an analytic system
    is a configuration error (raised, not silently dropped)."""
    import jax.numpy as jnp
    ani = make_system("box_pushing", 0.1)
    lcp = make_system("box_pushing", 0.1, contact_model="lcp")
    # Boundary-layer probe: Anitescu reacts to a gap-closing command,
    # LCP does not (gap still positive at the start of the step).
    x = jnp.asarray([0., 0.5, 0., 0., -0.13], jnp.float32)
    u = jnp.asarray([0., -0.03], jnp.float32)
    assert float(ani.step(x, u)[1]) > 0.5 + 1e-3
    assert abs(float(lcp.step(x, u)[1]) - 0.5) < 1e-4
    with pytest.raises(ValueError):
        make_system("pendulum", 0.05, contact_model="lcp")
    cfg = ExperimentConfig(system="box_pushing", contact_model="lcp")
    assert cfg.contact_model == "lcp"


def test_experiment_config_build_system_threads_contact_model():
    """ExperimentConfig.build_system() must thread contact_model through —
    constructing via make_system(cfg.system, cfg.h) alone drops it
    (round-2 advisor finding)."""
    import jax.numpy as jnp
    cfg = ExperimentConfig(system="box_pushing", h=0.1, contact_model="lcp")
    sys_lcp = cfg.build_system()
    x = jnp.asarray([0., 0.5, 0., 0., -0.13], jnp.float32)
    u = jnp.asarray([0., -0.03], jnp.float32)
    # LCP: a still-open gap produces no reaction.
    assert abs(float(sys_lcp.step(x, u)[1]) - 0.5) < 1e-4


def test_quasistatic_contact_model_validated():
    """A typo'd contact_model must raise at construction, not silently
    select the Anitescu branch (round-2 advisor finding)."""
    import dataclasses
    from irs_mpc_tpu.models.contact.systems import make_box_pushing
    m = make_box_pushing()
    with pytest.raises(ValueError):
        dataclasses.replace(m, contact_model="lpc")


def test_smoothing_config_value_hash():
    """Reconstructed / dataclasses.replace'd configs must compare and hash
    equal so they share one jit-cache entry instead of retracing (round-2
    verdict hygiene item)."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    def build():
        return SmoothingConfig(num_samples=50, std_u=0.3, std_x=1e-3,
                               decay=lambda it: 1.0 / it ** 0.8,
                               decay_std_x=False)

    a, b = build(), build()
    assert a == b and hash(a) == hash(b)
    c = dataclasses.replace(a)
    assert a == c and hash(a) == hash(c)
    d = dataclasses.replace(a, num_samples=51)
    assert a != d
    # Array-valued stds participate by value.
    e1 = dataclasses.replace(a, std_u=np.ones(3) * 0.3)
    e2 = dataclasses.replace(b, std_u=np.ones(3) * 0.3)
    assert e1 == e2 and hash(e1) == hash(e2)
    assert e1 != dataclasses.replace(a, std_u=np.ones(3) * 0.4)

    # Retrace-count check: a jit with the config as a static argument must
    # hit the cache for a reconstructed config.
    traces = []

    @functools.partial(jax.jit, static_argnums=0)
    def f(cfg, x):
        traces.append(1)
        sx, su = cfg.stds(jnp.asarray(2.0), 1, 1)
        return x * su

    f(build(), jnp.ones(1))
    f(build(), jnp.ones(1))
    f(dataclasses.replace(build()), jnp.ones(1))
    assert len(traces) == 1, f"retraced {len(traces)} times for equal configs"


def test_bounds_magnitude_guard():
    """Bounds beyond the BOUND_BIG mask must be rejected at construction
    (they would silently saturate padded-stage masking)."""
    T = 10
    base = dict(
        Q=np.diag([1., 1.]), Qd=np.diag([20., 20.]), R=np.diag([1.]),
        x0=np.zeros(2), xd_trj=np.tile([np.pi, 0.], (T + 1, 1)),
        u_trj_init=np.tile([0.1], (T, 1)))
    with pytest.raises(RuntimeError, match="magnitude"):
        IrsMpc(make_pendulum(0.05), IrsMpcParams(
            **base, u_bounds_abs=np.array([[-5e6], [5e6]])))
    # np.inf entries are the supported way to leave a side unconstrained.
    s = IrsMpc(make_pendulum(0.05), IrsMpcParams(
        **base, u_bounds_abs=np.array([[-np.inf], [10.0]])))
    s.iterate(1, verbose=False)
    assert np.all(np.asarray(s.u_trj) <= 10.0 + 1e-6)
