"""brief_pytorch_tpu.core"""
