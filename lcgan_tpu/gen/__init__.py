from lcgan_tpu.gen.artifacts import demo_generation, fake_image_generation, monitor_current_result

__all__ = ["demo_generation", "fake_image_generation", "monitor_current_result"]
