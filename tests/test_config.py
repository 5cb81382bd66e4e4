"""Unified config tree serialization."""

import dataclasses

import numpy as np

from quadrotor_manipulator_mppi_tpu import config as cfg_mod


def test_roundtrip_default(tmp_path):
    cfg = cfg_mod.ExperimentConfig()
    path = str(tmp_path / "exp.json")
    cfg_mod.save_config(cfg, path)
    back = cfg_mod.load_config(path)
    assert back.solver.mppi.n_samples == cfg.solver.mppi.n_samples
    assert back.gains.kp_roll == cfg.gains.kp_roll
    np.testing.assert_allclose(
        np.asarray(back.solver.mppi.sigma), np.asarray(cfg.solver.mppi.sigma)
    )
    np.testing.assert_allclose(
        np.asarray(back.solver.mppi.u_min), np.asarray(cfg.solver.mppi.u_min)
    )
    assert back.solver.model.control_mode == cfg.solver.model.control_mode


def test_roundtrip_modified(tmp_path):
    cfg = cfg_mod.ExperimentConfig()
    cfg = cfg_mod.replace_path(cfg, "solver.mppi.lam", 0.05)
    cfg = cfg_mod.replace_path(cfg, "solver.cost.obstacle_weight", 10.0)
    cfg = cfg_mod.replace_path(
        cfg, "solver.cost.obstacle_centers", ((1.0, 2.0, 3.0),)
    )
    path = str(tmp_path / "exp.json")
    cfg_mod.save_config(cfg, path)
    back = cfg_mod.load_config(path)
    assert back.solver.mppi.lam == 0.05
    assert back.solver.cost.obstacle_weight == 10.0
    assert back.solver.cost.obstacle_centers == ((1.0, 2.0, 3.0),)


def test_replace_path_is_functional():
    cfg = cfg_mod.ExperimentConfig()
    cfg2 = cfg_mod.replace_path(cfg, "solver.mppi.n_samples", 128)
    assert cfg.solver.mppi.n_samples == 4096
    assert cfg2.solver.mppi.n_samples == 128


def test_loaded_config_builds_solver(tmp_path):
    import jax

    from quadrotor_manipulator_mppi_tpu.solver import whole_body as wbs

    cfg = cfg_mod.ExperimentConfig()
    cfg = cfg_mod.replace_path(cfg, "solver.mppi.n_samples", 32)
    cfg = cfg_mod.replace_path(cfg, "solver.mppi.n_horizon", 8)
    path = str(tmp_path / "exp.json")
    cfg_mod.save_config(cfg, path)
    back = cfg_mod.load_config(path)
    step, init = wbs.make_whole_body_solver(
        back.solver, low_k_guard="off"  # intentional tiny smoke shape
    )
    out, _ = step(init(jax.random.key(back.seed)), wbs.default_obs())
    assert out.action.shape == (wbs.N_ACTIONS,)


def test_round3_configs_round_trip(tmp_path):
    """The round-3 subsystem configs (fixed-wing, mapping, sensing) are
    registered and JSON round-trip exactly."""
    from quadrotor_manipulator_mppi_tpu.config import load_config, save_config
    from quadrotor_manipulator_mppi_tpu.sim.mapped_loop import (
        MappedFlightConfig,
    )
    from quadrotor_manipulator_mppi_tpu.sim.occupancy import OccupancyParams
    from quadrotor_manipulator_mppi_tpu.models.fixed_wing import (
        FwVehicleParams,
    )

    for cfg in (
        MappedFlightConfig(margin=0.7),
        OccupancyParams(resolution=0.2, shape=(10, 12, 6)),
        FwVehicleParams(mass=3.0),
    ):
        p = str(tmp_path / (type(cfg).__name__ + ".json"))
        save_config(cfg, p)
        back = load_config(p)
        assert back == cfg, (cfg, back)


def test_round4_subsystem_configs_round_trip(tmp_path):
    """Camera-stack + episode-option dataclasses survive the JSON trip
    (incl. the wrench stop-cost fields on WholeBodyCostParams)."""
    import dataclasses

    from quadrotor_manipulator_mppi_tpu.sim.geotag import GeotagParams
    from quadrotor_manipulator_mppi_tpu.sim.gimbal import GimbalParams
    from quadrotor_manipulator_mppi_tpu.sim.whole_body_loop import (
        WholeBodyLoopConfig,
    )
    from quadrotor_manipulator_mppi_tpu.solver.whole_body import (
        WholeBodyCostParams,
    )

    for cfg in (
        GimbalParams(kp_yaw=2.0),
        GeotagParams(interval=0.5, lat_home_deg=10.0),
        WholeBodyLoopConfig(arm_coeffs_per_control=True, payload_mass=0.5),
        WholeBodyCostParams(stop_weight=4000.0, stop_horizon=1.2),
    ):
        p = str(tmp_path / f"{type(cfg).__name__}.json")
        cfg_mod.save_config(cfg, p)
        back = cfg_mod.load_config(p)
        assert back == cfg, (cfg, back)
