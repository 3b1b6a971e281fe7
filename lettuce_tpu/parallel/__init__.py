from .decomposition import DomainDecomposition, sharded_stream, roll_sharded

__all__ = ["DomainDecomposition", "sharded_stream", "roll_sharded"]
