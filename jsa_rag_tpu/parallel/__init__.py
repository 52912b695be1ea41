from .mesh import make_mesh, default_mesh, MeshAxes  # noqa: F401
