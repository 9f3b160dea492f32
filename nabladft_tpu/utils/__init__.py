"""Small shared utilities (file formats, misc helpers)."""
