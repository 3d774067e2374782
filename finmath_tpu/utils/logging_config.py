"""Logging configuration.

Analog of the reference's ``logging.properties`` (/root/reference/
logging.properties:1-15): a ``net.finmath``-style logger hierarchy with a
console handler and an optional TCP socket handler (the reference ships a
SocketHandler to 127.0.0.1:50505 at FINEST). Our hierarchy root is
``finmath_tpu``; pool/allocation-level tracing maps to DEBUG.
"""

from __future__ import annotations

import logging
import logging.handlers
from typing import Optional

ROOT_LOGGER = "finmath_tpu"


def configure_logging(console_level: int = logging.INFO,
                      socket_host: Optional[str] = None,
                      socket_port: int = 50505,
                      socket_level: int = logging.DEBUG) -> logging.Logger:
    """Set up the finmath_tpu logger like the reference's logging.properties:
    console at the given level, optional TCP socket handler."""
    logger = logging.getLogger(ROOT_LOGGER)
    logger.setLevel(min(console_level, socket_level if socket_host else console_level))
    logger.handlers.clear()
    # dedicated handlers below: stop propagation so an application's root
    # handlers do not print every record a second time (the reference's
    # logging.properties isolates the net.finmath hierarchy the same way)
    logger.propagate = False

    console = logging.StreamHandler()
    console.setLevel(console_level)
    console.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s"
    ))
    logger.addHandler(console)

    if socket_host:
        sock = logging.handlers.SocketHandler(socket_host, socket_port)
        sock.setLevel(socket_level)
        logger.addHandler(sock)
    return logger
