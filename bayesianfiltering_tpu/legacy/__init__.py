"""Legacy (v0) object-oriented API — the reference's NumPy generation
(SURVEY.md §2.3), rebuilt as thin classes over the JAX core so every v0
capability survives: GaussFilt/UKF/MCF/EKF/MCLAF and the composite bank
(gaussfilt), standalone GSF + the original AGSF with selection modes
(gausssumfilt), BootstrapPF (particlefilt), ALA mean estimators, static
joint approximation, and the Simulation wrapper.
"""
from bayesianfiltering_tpu.legacy.gaussfilt import (
    SSM,
    GaussFilt,
    UKF,
    MCF,
    EKF,
    MCLAF,
    GaussSumFilt as CompositeGaussSumFilt,
)
from bayesianfiltering_tpu.legacy.gausssumfilt import GaussSumFilt, AugGaussSumFilt
from bayesianfiltering_tpu.legacy.particlefilt import BootstrapPF
from bayesianfiltering_tpu.legacy.static_utils import (
    MixtureModel,
    AugmentedJointApproximation,
    plot_cov_ellipse,
)
from bayesianfiltering_tpu.legacy.simulation import Simulation
from bayesianfiltering_tpu.legacy import ala, mean_estimators, nonlinearities
from bayesianfiltering_tpu.legacy.ala import StateSpaceModel, LinearModelParameters

__all__ = [
    "SSM", "GaussFilt", "UKF", "MCF", "EKF", "MCLAF",
    "CompositeGaussSumFilt", "GaussSumFilt", "AugGaussSumFilt",
    "BootstrapPF", "MixtureModel", "AugmentedJointApproximation",
    "plot_cov_ellipse", "Simulation", "ala", "mean_estimators", "nonlinearities",
    "StateSpaceModel", "LinearModelParameters",
]
