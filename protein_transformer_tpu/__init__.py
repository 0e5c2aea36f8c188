"""protein_transformer_tpu: a TPU-native protein structure prediction framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
jonathanking/protein-transformer: sequence -> torsion-angle transformer models,
on-device differentiable all-atom structure building (NeRF), dRMSD-family
losses, ProteinNet data pipeline, and an SPMD trainer for TPU device meshes.
"""
__version__ = "0.1.0"
