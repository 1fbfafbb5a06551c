from .traj import pack_xu, unpack_xu, goals_from_flat

__all__ = ["pack_xu", "unpack_xu", "goals_from_flat"]
