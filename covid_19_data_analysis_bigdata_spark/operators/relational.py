"""Projection / filter / cleaning / sort / set operators (categories 2, 6, 7)."""
