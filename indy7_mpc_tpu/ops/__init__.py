from . import kkt, pcg, riccati, riccati_pscan

__all__ = ["kkt", "pcg", "riccati", "riccati_pscan"]
