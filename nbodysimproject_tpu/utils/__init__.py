from .seeding import set_global_seed
from .summation import kahan_sum, pairwise_sum, two_sum

__all__ = ["set_global_seed", "kahan_sum", "pairwise_sum", "two_sum"]
