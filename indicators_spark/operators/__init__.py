"""Operator mixins composing the :class:`indicators_spark.core.Indicators` API."""
