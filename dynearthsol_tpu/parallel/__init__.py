from .sharding import make_device_mesh, shard_simulation_state, state_shardings

__all__ = ["make_device_mesh", "shard_simulation_state", "state_shardings"]
