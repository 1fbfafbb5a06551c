from .sqp import SolverState, SQPResult, SQPStats, solve, batch_solve

__all__ = ["SolverState", "SQPResult", "SQPStats", "solve", "batch_solve"]
