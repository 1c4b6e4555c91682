"""serve subpackage: dependency-free HTTP API tier."""
