from .mesh import (
    make_path_mesh,
    mc_price_sharded,
    sharded_mean,
)

__all__ = ["make_path_mesh", "mc_price_sharded", "sharded_mean"]
