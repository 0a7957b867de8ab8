"""Minimal classic-gym shim (gym is not installed; gymnasium is).

Provides gym.Env and gym.spaces.Box with the old-style seed() API the
reference env uses (simulated_cars_env.py imports `gym` and `gym.spaces`).
"""
from . import spaces  # noqa: F401


class Env:
    metadata = {}

    def seed(self, seed=None):
        return [seed]

    def close(self):
        pass

    def render(self, mode="human"):
        pass
