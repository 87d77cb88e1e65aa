"""Projective curve arithmetic for G1/G2 on digit planes."""
