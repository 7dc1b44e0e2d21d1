from .generate import create_new_mesh, MeshData
from .topology import build_topology, Topology

__all__ = ["create_new_mesh", "MeshData", "build_topology", "Topology"]
