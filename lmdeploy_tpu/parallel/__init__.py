from .mesh import build_mesh, make_llama_shardings, cache_sharding, data_sharding  # noqa: F401
