"""Medallion bronze→silver→gold stages over the image+caption table."""
