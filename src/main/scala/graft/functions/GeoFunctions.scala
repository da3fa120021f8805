package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal geo family (SURVEY.md §2.8 geo row; Doris ST_Point / ST_X / ST_Y
  * / ST_Distance_Sphere / ST_Contains,
  * [doris: be/src/vec/functions/functions_geo.cpp]).
  *
  * Points are plain (x, y) structs and every function is pure Column math
  * over codegen'd builtins — no UDFs and no geometry library. The v1 surface
  * is points, spherical distance, and axis-aligned rectangle containment:
  * the distance/geofence queries BI dashboards actually run. Everything
  * stays inside WholeStageCodegen, so at 100 TB these are scan-speed
  * per-row expressions like any other scalar family.
  */
object GeoFunctions {

  /** Mean Earth radius in meters — the haversine sphere Doris uses. */
  private val EarthRadiusM = 6371000.0

  def stPoint(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))
  def stX(p: Column): Column = p.getField("x")
  def stY(p: Column): Column = p.getField("y")

  /** Great-circle distance in meters between (lon1, lat1) and (lon2, lat2):
    * haversine on the 6371 km sphere, Doris ST_Distance_Sphere arg order. */
  def stDistanceSphere(lon1: Column, lat1: Column,
      lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val h = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    asin(sqrt(h)) * (2.0 * EarthRadiusM)
  }

  /** ST_Contains for an axis-aligned rectangle (the v1 polygon surface),
    * inclusive bounds like Doris' boundary-inclusive ST_Contains. */
  def stContainsRect(xMin: Column, yMin: Column, xMax: Column, yMax: Column,
      p: Column): Column =
    stX(p).between(xMin, xMax) && stY(p).between(yMin, yMax)
}
