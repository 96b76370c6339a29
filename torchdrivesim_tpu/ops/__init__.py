"""
TPU-native compute ops: oriented-box geometry, differentiable IoU,
disc-based collision, point-to-triangle distance, and rasterization.
"""
