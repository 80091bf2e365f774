from skyrim_tpu.parallel.mesh import make_mesh, MeshAxes  # noqa: F401
