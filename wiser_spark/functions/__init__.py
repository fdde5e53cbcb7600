"""Scalar/vector kernels shared by the oracle engine and the Spark UDFs."""
