package graft.regrid

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Analytic test fields (reference `xesmf/data.py`). */
object TestFields {

  /** `wave_smooth`: low-frequency spherical harmonic
    * `2 + cos^2(lat) * cos(2*lon)` with lon/lat in degrees
    * (reference `xesmf/data.py:8-44`, Jones 1999 eq. Y_2^2).
    * Range [1, 3] — never 0, so relative error is always defined. */
  def waveSmooth(lon: Column, lat: Column): Column =
    lit(2.0) + pow(cos(radians(lat)), 2) * cos(lit(2.0) * radians(lon))
}
