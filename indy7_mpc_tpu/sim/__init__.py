from .plant import plant_step, predict_next_states

__all__ = ["plant_step", "predict_next_states"]
