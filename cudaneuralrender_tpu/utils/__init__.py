"""Subpackage of cudaneuralrender_tpu."""
