"""Applications layered on the framework (ref: /root/reference/apps/)."""
