// Host-weather check without a bench run: prints the serial + parallel
// LCG canaries (same recipes as graft.Bench emits). Use before timing
// anything — a canary_par far above ~0.15 on this host means co-tenant
// contention and any A/B run now is noise.
//   tools/run_graft.sh graft.tools.WeatherProbe
package graft.tools

import graft.Bench

object WeatherProbe {
  def main(args: Array[String]): Unit = {
    val par = Bench.hostCanaryParallel()
    val ser = Bench.hostCanary()
    println(f"WEATHER canary_par=$par%.3f canary_serial=$ser%.3f " +
      "(ref par 0.138)")
  }
}
