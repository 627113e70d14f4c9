"""Legacy simulation wrapper (ref: gaussfiltax/simulation.py:1-5)."""
from __future__ import annotations

from bayesianfiltering_tpu.types import PRNGKey


class Simulation:
    """Holds a model rollout: ``Simulation(model, T, init_state)`` runs
    ``model.simulate`` and stores ``(states, observs)``."""

    def __init__(self, model, T: int, init_state, key: PRNGKey = None):
        self.model = model
        kwargs = {} if key is None else {"key": key}
        self.states, self.observs = model.simulate(T, init_state, **kwargs)


__all__ = ["Simulation"]
