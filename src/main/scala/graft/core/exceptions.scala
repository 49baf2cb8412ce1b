package graft.core

/** Exception hierarchy mirroring the reference's
  * (sqltask/base/exceptions.py:1-14).
  */
class GraftException(msg: String) extends RuntimeException(msg)

/** Raised by aggregate validation when a result has too few rows
  * (reference exceptions.py:9-10; used by `validate()` hooks).
  */
class TooFewRowsException(msg: String) extends GraftException(msg)

/** Raised when a mandatory (non-nullable) value is missing. */
class MandatoryValueMissingException(msg: String) extends GraftException(msg)

/** Raised on invalid task/execution arguments. */
class ExecutionArgumentException(msg: String) extends GraftException(msg)
