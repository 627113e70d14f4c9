"""Filter step primitives: EKF, UKF, linear KF, parallel KF, MC moments."""
from bayesianfiltering_tpu.ops.ekf import (
    EKFUpdate,
    ekf_predict,
    ekf_condition_on,
    ekf_condition_on_iterated,
    ekf_step,
)
from bayesianfiltering_tpu.ops.ukf import (
    ParamsUKF,
    ukf_predict_additive,
    ukf_predict_nonadditive,
    ukf_condition_on_additive,
    ukf_condition_on_nonadditive,
)
from bayesianfiltering_tpu.ops.linear import (
    ParamsLGSSM,
    PosteriorKalman,
    kalman_filter,
    kalman_smoother,
)
from bayesianfiltering_tpu.ops.associative import parallel_kalman_filter
from bayesianfiltering_tpu.ops.parallel_iterated import (
    parallel_iterated_extended_smoother,
    parallel_iterated_sigma_point_smoother,
)
from bayesianfiltering_tpu.ops.slr import mc_moments, mcla_moments

__all__ = [
    "EKFUpdate", "ekf_predict", "ekf_condition_on",
    "ekf_condition_on_iterated", "ekf_step",
    "ParamsUKF", "ukf_predict_additive", "ukf_predict_nonadditive",
    "ukf_condition_on_additive", "ukf_condition_on_nonadditive",
    "ParamsLGSSM", "PosteriorKalman", "kalman_filter", "kalman_smoother",
    "parallel_kalman_filter",
    "parallel_iterated_extended_smoother",
    "parallel_iterated_sigma_point_smoother",
    "mc_moments", "mcla_moments",
]
