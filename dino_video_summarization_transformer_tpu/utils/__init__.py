from .misc import bool_flag, fix_random_seeds, get_sha

__all__ = ["bool_flag", "fix_random_seeds", "get_sha"]
