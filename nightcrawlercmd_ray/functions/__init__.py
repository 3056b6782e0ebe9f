"""Pure, deterministic per-record functions (no Ray dependency).

Everything in this subpackage is stateless and safe to call from map_batches
UDFs, the serial oracle, and unit tests alike.
"""
