from .plant import apply_joint_limits, plant_step, predict_next_states

__all__ = ["apply_joint_limits", "plant_step", "predict_next_states"]
