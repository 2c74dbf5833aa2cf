"""brief_pytorch_tpu.models"""
