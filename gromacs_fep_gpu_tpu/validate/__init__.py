"""Validation against recorded GROMACS reference data."""
