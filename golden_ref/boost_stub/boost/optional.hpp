// boost/optional.hpp is included by ssw_cpp.h but never used; empty stub.
#ifndef BOOST_STUB_OPTIONAL_HPP
#define BOOST_STUB_OPTIONAL_HPP
#endif
