from . import kkt, riccati

__all__ = ["kkt", "riccati"]
