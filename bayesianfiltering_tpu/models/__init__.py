"""Model layer: parameter containers, constraint system, SSM classes, zoo."""
from bayesianfiltering_tpu.models.params import (
    ParamsNLSSM,
    ParamsBPF,
    FnStateToState,
    FnStateAndInputToState,
    FnStateToEmission,
    FnStateAndInputToEmission,
)
from bayesianfiltering_tpu.models.parameters import (
    ParameterSet,
    PropertySet,
    ParameterProperties,
    to_unconstrained,
    from_unconstrained,
    log_det_jac_constrain,
)
from bayesianfiltering_tpu.models.ssm import SSM
from bayesianfiltering_tpu.models.nonlinear import (
    NonlinearGaussianSSM,
    NonlinearSSM,
)
from bayesianfiltering_tpu.models.linear_gaussian import (
    LinearGaussianSSM,
    PropsLGSSM,
)
from bayesianfiltering_tpu.models import bijectors, zoo
from bayesianfiltering_tpu.models._fit import (
    ensure_array_has_batch_dim,
    run_sgd,
)

__all__ = [
    "ParamsNLSSM", "ParamsBPF",
    "FnStateToState", "FnStateAndInputToState",
    "FnStateToEmission", "FnStateAndInputToEmission",
    "ParameterSet", "PropertySet", "ParameterProperties",
    "to_unconstrained", "from_unconstrained", "log_det_jac_constrain",
    "SSM", "NonlinearGaussianSSM", "NonlinearSSM", "LinearGaussianSSM", "PropsLGSSM",
    "bijectors", "zoo",
    "ensure_array_has_batch_dim", "run_sgd",
]
