package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("morton key interleaves bits: x on even positions, y on odd") {
    // bx=3 (011), by=5 (101): z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    //   = 1 + 2 + 4 + 0 + 0 + 32 = 39
    val z = Seq((3, 5)).toDF("bx", "by")
      .select(Layout.mortonKey(col("bx"), col("by"), 3).as("z"))
      .head().getInt(0)
    assert(z == 39)
  }

  test("zone maps: every file is bounded in BOTH dimensions (16x16 tiles)") {
    // 64x64 grid, 6-bit buckets (identity), 16 files: the Morton curve makes
    // each file exactly one 16x16 tile — x AND y spans of 15, never the full
    // 63 a single-dimension sort would leave on the other axis
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val zm = Layout.zorderZoneMap(grid.toDF("x", "y"), col("x"), col("y"),
      0, 63, 0, 63, bits = 6, files = 16).collect()
    assert(zm.length == 16)
    zm.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 256L)
      assert(r.getAs[Int]("x_max") - r.getAs[Int]("x_min") == 15)
      assert(r.getAs[Int]("y_max") - r.getAs[Int]("y_min") == 15)
    }
  }

  test("linear layout: tight on x, the y axis stays fully unpruned") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val zm = Layout.linearZoneMap(grid.toDF("x", "y"), col("x"), col("y"),
      0, 63, bits = 6, files = 16).collect()
    assert(zm.length == 16)
    zm.foreach { r =>
      assert(r.getAs[Int]("x_max") - r.getAs[Int]("x_min") == 3)  // 64/16 - 1
      assert(r.getAs[Int]("y_max") - r.getAs[Int]("y_min") == 63) // full span
    }
  }

  test("boundsOf returns the exact global min/max per dimension") {
    val df = Seq((5, -2), (9, 11), (7, 3)).toDF("x", "y")
    assert(Layout.boundsOf(df, col("x"), col("y")) == ((5, 9, -2, 11)))
  }
}
