from .process import ImuWindow, predict_window, process_noise_Q

__all__ = ["ImuWindow", "predict_window", "process_noise_Q"]
