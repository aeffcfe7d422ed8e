// Minimal boost::progress_display stand-in (GenbankTools.h:228,486).
#ifndef BOOST_STUB_PROGRESS_HPP
#define BOOST_STUB_PROGRESS_HPP

#include <cstddef>

namespace boost {

class progress_display {
  unsigned long count_ = 0;

 public:
  explicit progress_display(unsigned long expected) { (void)expected; }
  unsigned long operator++() { return ++count_; }
  unsigned long operator+=(unsigned long n) { return count_ += n; }
  unsigned long count() const { return count_; }
};

}  // namespace boost

#endif
