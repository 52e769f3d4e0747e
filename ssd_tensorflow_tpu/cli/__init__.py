"""Command-line drivers — same five entry points as the reference:

process_dataset -> train -> infer -> export_model -> detect
"""
