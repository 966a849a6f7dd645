"""TXR — a TPU-native differentiable ray tracer.

A from-scratch JAX/Pallas re-design of the capabilities of
engilas/raytracing-opengl (analytic whole-frame ray tracing: sphere, plane,
box, ring, torus and the quadric family, quaternion rotations, Phong +
shadows + Fresnel reflection/refraction, textures and cubemap environment),
extended with end-to-end differentiability and multi-chip sharding.
"""

__version__ = "0.1.0"
